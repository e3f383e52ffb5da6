"""Headline benchmark: BoundMPC solves/s/chip.

Measures sustained throughput of the full closed-loop pipeline — fused MPC
tick (condensed Gauss-Newton SQP + per-tick link collision sets + switching
logic) plus plant integration — as ONE compiled scan of T dependent control
periods over a batch of scenes. A single dispatch with an in-program
dependency chain makes the timing immune to async-dispatch artifacts.

Baseline: the reference runs ONE Ipopt solve per 0.1 s real-time budget per
CPU (`utils/util_functions.py:49`, `MPCNode.py:160`), i.e. 10 solves/s;
``vs_baseline`` is the speedup over that.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the fused MPC tick is a large XLA program
    # and remote TPU compiles are slow; cache across processes/rounds.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from boundplanner_tpu.config import perf_mpc_params
    from boundplanner_tpu.demo import demo_scene, stack_scenes
    from boundplanner_tpu.parallel.batch import closed_loop_rollout

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    cfg = perf_mpc_params()
    carry, meas, obs, q0 = demo_scene(cfg, dtype=np.float32)
    cb, mb, ob = stack_scenes(carry, meas, obs, batch)
    q0b = np.broadcast_to(np.asarray(q0, np.float32), (batch, 7)).copy()

    cb = jax.device_put(cb)
    ob = jax.device_put(ob)
    q0b = jax.device_put(jnp.asarray(q0b))

    roll = jax.jit(
        lambda c, q, o: jax.vmap(
            lambda cc, qq, oo: closed_loop_rollout(cc, qq, oo, cfg, ticks)
        )(c, q, o)
    )

    # compile + warm up (forces a real sync via scalar fetch)
    final, recs = roll(cb, q0b, ob)
    _ = float(recs["phi"][0, -1])

    import os
    trace_dir = os.environ.get("BENCH_TRACE_DIR")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            final, recs = roll(cb, q0b, ob)
            _ = float(recs["phi"][0, -1])

    t0 = time.perf_counter()
    final, recs = roll(cb, q0b, ob)
    _ = float(recs["phi"][0, -1])
    wall = time.perf_counter() - t0

    solves_per_s = batch * ticks / wall
    print(
        json.dumps(
            {
                "metric": "boundmpc_solves_per_s_per_chip",
                "value": round(solves_per_s, 2),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / 10.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
