"""Headline benchmark: BoundMPC solves/s/chip.

Measures the throughput of the fused MPC tick (condensed Gauss-Newton SQP
solve + per-tick link collision sets + switching logic) batched over
scenarios on one chip. Baseline: the reference runs ONE Ipopt solve per
0.1 s real-time budget per CPU (`utils/util_functions.py:49`,
`MPCNode.py:160`), i.e. 10 solves/s; ``vs_baseline`` is the speedup over
that.

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

    from boundplanner_tpu.config import MPCParams
    from boundplanner_tpu.demo import demo_scene, stack_scenes
    from boundplanner_tpu.mpc.bound_mpc import mpc_tick

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from boundplanner_tpu.config import perf_mpc_params
    cfg = perf_mpc_params()
    carry, meas, obs, _ = demo_scene(cfg, dtype=jnp.float32)
    carry_b, meas_b, obs_b = stack_scenes(carry, meas, obs, batch)

    @jax.jit
    def step(carry, meas, obs):
        return jax.vmap(lambda c, m, o: mpc_tick(c, m, o, cfg))(carry, meas, obs)

    # compile + warm up
    new_carry, out = step(carry_b, meas_b, obs_b)
    jax.block_until_ready(out["phi"])

    t0 = time.perf_counter()
    c = carry_b
    for _ in range(reps):
        c, out = step(c, meas_b, obs_b)
    jax.block_until_ready(out["phi"])
    dt = time.perf_counter() - t0

    solves_per_s = batch * reps / dt
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
