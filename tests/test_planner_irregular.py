"""Planner robustness on graph paths with an irregular set chain (an
extra set change at the terminal node mis-packs the rotation NLP's fixed
parameter layout; ref `BoundPlanner.py:651-667` has the same assumption)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from boundplanner_tpu.parallel.fleet import plan_scene, random_scene
from boundplanner_tpu.config import MPCParams


@pytest.mark.slow
def test_fleet_scene_sweep_does_not_crash():
    """Sweep the randomized-scene generator across many seeds; planning
    must either succeed or decline gracefully (None), never raise."""
    cfg = MPCParams(sqp_iters=2, qp_iters=5, line_search_steps=2)
    rng_q0 = np.zeros(7)
    rng_q0[3] = -np.pi / 2
    rng_q0[5] = np.pi / 2
    planned = 0
    for draw in range(1, 30):
        rng_i = np.random.default_rng(7 + 1000 * draw)
        obstacles, goal = random_scene(rng_i, 2)
        out = plan_scene(rng_q0, goal, obstacles, 7 + draw, cfg)
        planned += out is not None
    assert planned >= 20  # most scenes must actually plan
