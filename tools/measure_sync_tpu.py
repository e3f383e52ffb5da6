"""Measure the phase-sync fleet builder on its claimed win domain: the
dispatch-count-bound tunnel-attached TPU backend (VERDICT r3 next-#6).

Round 3 measured `build_fleet_sync` only on CPU (wall-clock SLOWER than
the linger broker despite 1.5x the coalescing width) and left the claim
"the win is dispatch-bound backends" untested. This harness builds the
SAME fleet through both builders on the axon backend and reports wall
clock + broker dispatch counters — adoption evidence for
`fleet_cache`'s backend pick, or the basis for retiring the module.

Usage: python tools/measure_sync_tpu.py [batch=32] [mode=both|sync|threaded]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from boundplanner_tpu.config import perf_mpc_params  # noqa: E402
from boundplanner_tpu.parallel.fleet import (  # noqa: E402
    build_fleet_sync,
    build_fleet_threaded,
)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"
    cfg = perf_mpc_params()
    print(f"backend: {jax.default_backend()}")
    out = {}

    if mode in ("both", "threaded"):
        t0 = time.perf_counter()
        *_, brk = build_fleet_threaded(batch, cfg, n_threads=8, seed=11)
        wall = time.perf_counter() - t0
        out["threaded"] = {
            "wall_s": round(wall, 1),
            "plans_per_s": round(batch / wall, 3),
            "batches_run": brk.batches_run,
            "calls_served": brk.calls_served,
            "coalesced_calls": brk.coalesced_calls,
            "mean_width": round(
                brk.calls_served / max(brk.batches_run, 1), 2
            ),
        }
        print(json.dumps({"threaded": out["threaded"]}), flush=True)

    if mode in ("both", "sync"):
        t0 = time.perf_counter()
        *_, brk = build_fleet_sync(batch, cfg, n_workers=batch, seed=11)
        wall = time.perf_counter() - t0
        out["sync"] = {
            "wall_s": round(wall, 1),
            "plans_per_s": round(batch / wall, 3),
            **{k: v for k, v in brk.stats.items() if k != "width_hist"},
            "width_hist": {str(k): v for k, v in brk.stats["width_hist"].items()},
        }
        print(json.dumps({"sync": out["sync"]}), flush=True)


if __name__ == "__main__":
    main()
