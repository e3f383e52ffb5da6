"""One process of the multi-host CPU test fleet.

Launched (2x) by `tests/test_distributed.py` via
`boundplanner_tpu.parallel.distributed.launch` with JAX_PLATFORMS=cpu and
4 virtual devices per process. Joins the distributed runtime, feeds its
half of a deterministic 8-scene fleet, runs the distributed closed-loop
rollout, and prints one JSON line with its local results + the global
diagnostics for the parent to cross-check against the single-process run.

Importing this module is side-effect-free (the parent imports it for the
shared constants); all backend setup happens in ``main()``.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from boundplanner_tpu.config import MPCParams

GLOBAL_BATCH = 8
N_TICKS = 2
CFG = MPCParams(sqp_iters=2, qp_iters=4, line_search_steps=2)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from boundplanner_tpu.parallel import distributed as dist

    dist.initialize()

    import numpy as np

    from boundplanner_tpu.demo import demo_fleet

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    carry_b, obs_b, q0_b = demo_fleet(CFG, GLOBAL_BATCH, dtype=np.float64)
    sl = dist.local_batch_slice(GLOBAL_BATCH)
    take = lambda x: np.asarray(x)[sl]
    carry_l = jax.tree.map(take, carry_b)
    obs_l = jax.tree.map(take, obs_b)
    q0_l = q0_b[sl].astype(np.float64)

    final_l, recs_l, diag = dist.distributed_rollout(
        carry_l, q0_l, obs_l, CFG, N_TICKS
    )

    out = {
        "pid": jax.process_index(),
        "lo": sl.start,
        "diag": diag,
        "phi": np.asarray(recs_l["phi"][:, -1], np.float64).tolist(),
        "q": np.asarray(recs_l["q"][:, -1], np.float64).reshape(-1).tolist(),
    }
    print("WORKER_RESULT " + json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
