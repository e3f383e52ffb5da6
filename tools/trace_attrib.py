"""Aggregate an XLA profiler trace by Python source line.

Parses the `*.trace.json.gz` produced by `BENCH_TRACE_DIR=/tmp/t python
bench.py ...` and aggregates XLA op event durations by the op's
`args["source"]` (the Python source location XLA recorded for the HLO) —
a real per-source-line profile of the fused tick. While-loop lines
accumulate their whole body, so read LEAF ops (jnp calls), not loop
drivers.

Usage: python tools/trace_attrib.py /tmp/t [top_n=40] [--filter=qp.py]
"""
import gzip
import json
import os
import sys
from collections import defaultdict


def find_trace(root):
    hits = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".trace.json.gz"):
                hits.append(os.path.join(dirpath, f))
    if not hits:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    # newest capture wins
    return max(hits, key=os.path.getmtime)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/t"
    top_n = 40
    filt = None
    for a in sys.argv[2:]:
        if a.startswith("--filter="):
            filt = a.split("=", 1)[1]
        else:
            top_n = int(a)

    path = find_trace(root)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    # TPU op events live on "/device:TPU:*" pids; host threads also carry
    # events — keep only pids whose process name mentions a device
    dev_pids = set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "device" in name.lower():
                dev_pids.add(ev["pid"])

    by_src = defaultdict(float)
    by_op = defaultdict(float)
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        args = ev.get("args") or {}
        src = args.get("source") or args.get("source_info") or "<none>"
        if filt and filt not in src:
            continue
        by_src[src] += dur
        by_op[ev.get("name", "?")] += dur
        total += dur

    print(f"trace: {path}")
    print(f"total device op time (filtered): {total:.1f} ms\n")
    print("== by source line ==")
    for src, ms in sorted(by_src.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{ms:10.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {src}")
    print("\n== by op name (top 15) ==")
    for op, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{ms:10.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {op}")


if __name__ == "__main__":
    main()
