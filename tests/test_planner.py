"""Planner end-to-end tests on a small scene (host graph + device kernels)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from boundplanner_tpu.planner import BoundPlanner


@pytest.fixture(scope="module")
def planned():
    obstacles = [
        [0.25, -0.15, 0.0, 0.45, 0.15, 0.8],   # wall between start and goal
        [-0.5, -0.5, 0.0, -0.3, -0.3, 0.3],
    ]
    planner = BoundPlanner(
        e_p_max=0.5,
        obstacles=obstacles,
        workspace_max=[1.0, 1.0, 1.0],
        workspace_min=[-1.0, -1.0, 0.0],
        seed=0,
    )
    p0 = np.array([0.0, 0.0, 0.4])
    p1 = np.array([0.7, 0.0, 0.4])
    r0 = R.from_euler("XYZ", [0, 90, 0], degrees=True).as_matrix()
    r1 = R.from_euler("XYZ", [0, 45, 0], degrees=True).as_matrix()
    out = planner.plan_convex_set_path(p0, p1, r0, r1)
    return planner, p0, p1, r0, r1, out


def test_plan_structure(planned):
    planner, p0, p1, r0, r1, (p_via, r_via, bp1_list, sets_via) = planned
    assert len(p_via) >= 2
    np.testing.assert_allclose(p_via[0], p0, atol=1e-9)
    np.testing.assert_allclose(p_via[-1], p1, atol=1e-9)
    assert len(r_via) == len(p_via)
    assert len(bp1_list) == len(p_via) - 1
    assert len(sets_via) == len(p_via) - 1
    for a, b in sets_via:
        assert a.shape == (15, 3) and b.shape == (15,)


def test_vias_inside_sets(planned):
    planner, p0, p1, _, _, (p_via, r_via, bp1_list, sets_via) = planned
    for i, (a, b) in enumerate(sets_via):
        # both endpoints of segment i must be in set i (small tolerance:
        # via NLP shrinks sets by 1 mm)
        assert np.max(a @ p_via[i] - b) < 2e-3
        assert np.max(a @ p_via[i + 1] - b) < 2e-3


def test_segments_avoid_obstacles(planned):
    planner, p0, p1, _, _, (p_via, _, _, _) = planned
    # dense sampling of the polyline must stay out of the *original* obstacles
    for i in range(len(p_via) - 1):
        for t in np.linspace(0, 1, 25):
            x = (1 - t) * np.asarray(p_via[i]) + t * np.asarray(p_via[i + 1])
            for a, b in planner.obs_sets_orig:
                assert np.max(a @ x - b) > -1e-6, f"segment {i} hits obstacle"


def test_rotation_interpolation(planned):
    planner, p0, p1, r0, r1, (p_via, r_via, _, _) = planned
    np.testing.assert_allclose(r_via[0], r0, atol=1e-8)
    np.testing.assert_allclose(r_via[-1], r1, atol=1e-8)
    # intermediate rotations lie on the geodesic between r0 and r1
    omega = R.from_matrix(r1 @ r0.T).as_rotvec()
    for r in r_via[1:-1]:
        drot = R.from_matrix(np.asarray(r) @ r0.T).as_rotvec()
        cos = drot @ omega / (np.linalg.norm(drot) * np.linalg.norm(omega) + 1e-12)
        assert cos > 0.999 or np.linalg.norm(drot) < 1e-6


def test_bp1_orthogonal(planned):
    planner, _, _, _, _, (p_via, _, bp1_list, _) = planned
    for i, b1 in enumerate(bp1_list):
        dp = np.asarray(p_via[i + 1]) - np.asarray(p_via[i])
        dp = dp / np.linalg.norm(dp)
        assert abs(dp @ b1) < 1e-8
        np.testing.assert_allclose(np.linalg.norm(b1), 1.0, atol=1e-9)


def test_end_in_start_set_shortcut():
    """No obstacles between: plan collapses to a straight segment
    (ref `BoundPlanner.py:361-375`)."""
    planner = BoundPlanner(
        obstacles=[[0.5, 0.5, 0.0, 0.7, 0.7, 0.2]],
        workspace_max=[1.0, 1.0, 1.0],
        workspace_min=[-1.0, -1.0, 0.0],
        seed=0,
    )
    p0 = np.array([0.0, 0.0, 0.5])
    p1 = np.array([0.1, 0.0, 0.5])
    r0 = np.eye(3)
    p_via, r_via, bp1_list, sets_via = planner.plan_convex_set_path(p0, p1, r0, r0)
    assert len(p_via) == 2
    assert len(sets_via) == 1
