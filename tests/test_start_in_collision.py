"""Planner corridor soundness when the start EE point is inside a box.

Round-5 forensics: fleet scenes whose random boxes land on the start EE
produced segment-0 sets OVERLAPPING the box by 3-5 cm (a seed inside an
obstacle cannot be separated from it), and the MPC then tracked straight
through the overlap with zero constraint violation — the corridor, not
the controller, was unsound. The fix pushes the START point free for
fresh plans (the reference does this only for the END point,
`BoundPlanner.py:199-204`, and for the start when replanning, `:296-318`).
"""

import numpy as np
import pytest
from scipy.optimize import linprog
from scipy.spatial.transform import Rotation as R

from boundplanner_tpu.planner import BoundPlanner


def _overlap_depth(a, b, box):
    """Deepest point of {x: a x <= b} inside the AABB box (bisection on a
    uniformly shrunk box; 0 when the set and box are disjoint)."""
    lo_b = np.asarray(box[:3], float)
    hi_b = np.asarray(box[3:], float)
    a_box = np.vstack([np.eye(3), -np.eye(3)])
    b_box = np.concatenate([hi_b, -lo_b])
    lo, hi = 0.0, 0.3
    for _ in range(18):
        t = 0.5 * (lo + hi)
        res = linprog(np.zeros(3), A_ub=np.vstack([a, a_box]),
                      b_ub=np.concatenate([b, b_box - t]),
                      bounds=[(None, None)] * 3, method="highs")
        if res.status == 0:
            lo = t
        else:
            hi = t
    return lo


def test_start_inside_box_corridor_sound():
    # start EE point at the center of a box obstacle
    p0 = np.array([0.3, -0.3, 0.4])
    box = [0.25, -0.35, 0.35, 0.35, -0.25, 0.45]
    obstacles = [[0.2, -1.0, -0.1, 1.0, 1.0, 0.0], box]
    p1 = np.array([0.55, -0.45, 0.25])
    r0 = np.eye(3)
    r1 = R.from_euler("XYZ", [0, 90, 0], degrees=True).as_matrix()
    planner = BoundPlanner(
        e_p_max=0.5, obstacles=obstacles,
        workspace_max=[1.0, 0.38, 1.0], workspace_min=[-0.14, -1.0, 0.0],
        seed=0,
    )
    p_via, r_via, bp1_list, sets_via = planner.plan_convex_set_path(
        p0.copy(), p1, r0, r1
    )
    # the planned start via is OUTSIDE the box (pushed free)
    assert (np.any(p_via[0] < np.array(box[:3]) + 1e-9)
            or np.any(p_via[0] > np.array(box[3:]) - 1e-9))
    # every via-path set excludes the ORIGINAL (unexpanded) box to ~mm
    for a, b in sets_via:
        assert _overlap_depth(np.asarray(a), np.asarray(b), box) < 2e-3, (
            "corridor set overlaps the obstacle box"
        )


def test_free_start_plans_bit_identical():
    """The push is a no-op for collision-free starts."""
    p0 = np.array([0.3, 0.2, 0.6])
    obstacles = [[0.2, -1.0, -0.1, 1.0, 1.0, 0.0],
                 [0.35, -0.25, 0.0, 0.55, -0.1, 0.45]]
    p1 = np.array([0.45, -0.4, 0.25])
    r0 = np.eye(3)
    r1 = R.from_euler("XYZ", [0, 90, 0], degrees=True).as_matrix()

    def plan():
        pl = BoundPlanner(
            e_p_max=0.5, obstacles=obstacles,
            workspace_max=[1.0, 0.38, 1.0], workspace_min=[-0.14, -1.0, 0.0],
            seed=0,
        )
        return pl.plan_convex_set_path(p0.copy(), p1.copy(), r0, r1)

    p_via, _, _, sets_via = plan()
    np.testing.assert_array_equal(p_via[0], p0)
