"""Measure the phase-sync fleet builder on the TPU backend (VERDICT r3 #6).

`parallel.sync_broker.PhaseSyncBroker` was built for dispatch-count-bound
backends: on the tunnel-attached TPU every kernel dispatch pays a ~RTT
round trip, so coalescing N parked scenes' same-key planner calls into one
vmapped dispatch should win roughly by the achieved mean width. That claim
was never measured on its claimed win domain (round 3 measured only CPU,
where it LOSES — compute-bound, wall-clock 1.3x slower at width 2.27).

This benchmark plans the SAME fleet draw stream through
`build_fleet_threaded` (linger-window broker, the production TPU-path
builder candidate) and `build_fleet_sync` (barrier broker) on whatever
backend jax selects (run WITHOUT forcing cpu => tunnel TPU), and reports
wall-clock + dispatch counts. Each builder runs twice; the SECOND run's
wall-clock is reported so one-time XLA compiles (persistent-cached) don't
pollute the comparison.

Usage: python tools/bench_sync_tpu.py [batch=16] [workers=16]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from boundplanner_tpu.config import perf_mpc_params
    from boundplanner_tpu.parallel.fleet import (
        build_fleet_sync,
        build_fleet_threaded,
    )

    cfg = perf_mpc_params()
    print(f"# backend={jax.default_backend()} batch={batch} workers={workers}")

    out = {"backend": jax.default_backend(), "batch": batch}
    for name, run in (
        ("threaded", lambda: build_fleet_threaded(
            batch, cfg, n_obstacles=2, seed=3, n_threads=workers)),
        ("sync", lambda: build_fleet_sync(
            batch, cfg, n_obstacles=2, seed=3, n_workers=workers)),
    ):
        walls = []
        for rep in range(2):
            t0 = time.perf_counter()
            *_, brk = run()
            walls.append(time.perf_counter() - t0)
        out[name] = {
            "wall_s_run1": round(walls[0], 1),
            "wall_s_run2": round(walls[1], 1),
            "dispatches": brk.batches_run,
            "calls_served": brk.calls_served,
            "mean_width": round(brk.calls_served / max(brk.batches_run, 1), 2),
        }
        print(f"{name}: {out[name]}")
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
