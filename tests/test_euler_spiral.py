"""Clothoid corner blending tests (the reference module is bit-rotted,
SURVEY.md §2.4; these pin down the repaired behavior)."""

import numpy as np
import pytest

from boundplanner_tpu.path.euler_spiral import (
    create_euler_spiral,
    eval_blend,
    eval_euler_spiral,
)


def test_fresnel_series_small_angle():
    # a=0 -> straight line
    p = eval_euler_spiral(0.0, 0.3)
    np.testing.assert_allclose(p, [0.3, 0.0], atol=1e-12)


def test_straight_corner_degenerate():
    v = np.array([1.0, 0.0, 0.0])
    a, b, theta, rot2d, off, sh = create_euler_spiral(v, v)
    assert theta == 0.0 and off == 0.0


@pytest.mark.parametrize("deg", [30, 60, 90, 120])
def test_blend_geometry(deg):
    ang = np.deg2rad(deg)
    v1 = np.array([1.0, 0.0, 0.0])
    v2 = np.array([np.cos(ang), np.sin(ang), 0.0])
    L = 0.05
    a, b, theta, rot2d, off, sh = create_euler_spiral(v1, v2, L)
    # theta is the full corner angle; each clothoid half turns theta/2
    assert theta == pytest.approx(ang)
    corner = np.array([0.5, 0.0, 0.0])

    p_start = eval_blend(a, theta, rot2d, off, L, 0.0, corner, v1, v2)
    p_end = eval_blend(a, theta, rot2d, off, L, 2 * L, corner, v1, v2)
    # start lies on the incoming line, before the corner
    assert abs(p_start[1]) < 1e-12 and p_start[0] < corner[0]
    # end lies on the outgoing line through the corner
    d = p_end - corner
    cross = np.linalg.norm(np.cross(d, v2))
    assert cross < 1e-9

    # C1 continuity: tangents at junctions match v1 / v2
    eps = 1e-6
    t0 = eval_blend(a, theta, rot2d, off, L, eps, corner, v1, v2) - p_start
    np.testing.assert_allclose(t0 / np.linalg.norm(t0), v1, atol=1e-4)
    t1 = p_end - eval_blend(a, theta, rot2d, off, L, 2 * L - eps, corner, v1, v2)
    np.testing.assert_allclose(t1 / np.linalg.norm(t1), v2, atol=1e-4)
    # continuity at the midpoint junction
    m0 = eval_blend(a, theta, rot2d, off, L, L - eps, corner, v1, v2)
    m1 = eval_blend(a, theta, rot2d, off, L, L + eps, corner, v1, v2)
    assert np.linalg.norm(m1 - m0) < 1e-4


def test_blend_3d_plane():
    v1 = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
    v2 = np.array([0.0, -1.0, -0.3])
    v2 = v2 / np.linalg.norm(v2)
    a, bb, theta, rot2d, off, sh = create_euler_spiral(v1, v2, 0.05)
    corner = np.array([0.2, 0.1, 0.4])
    p_end = eval_blend(a, theta, rot2d, off, 0.05, 0.1, corner, v1, v2)
    d = p_end - corner
    assert np.linalg.norm(np.cross(d / np.linalg.norm(d), v2)) < 1e-6


def _corner_scene():
    """A 3-via right-angle path with generous box sets around each segment."""
    p_via = [np.array([0.0, 0.0, 0.5]), np.array([0.4, 0.0, 0.5]),
             np.array([0.4, 0.4, 0.5])]
    eye = np.eye(3)
    r_via = [eye, eye, eye]
    bp1 = [np.array([0.0, 0.0, 1.0])] * 2
    br1 = [np.array([1.0, 0.0, 0.0])] * 2
    erb = [np.array([1.0, 1.0, 1.0, -1.0, -1.0, -1.0])] * 2
    a_box = np.vstack([eye, -eye, np.zeros((9, 3))])

    def box(lo, hi):
        return np.concatenate([hi, -lo, 10.0 * np.ones(9)])

    a_sets = [a_box, a_box]
    b_sets = [box(np.array([-0.1, -0.1, 0.3]), np.array([0.5, 0.1, 0.7])),
              box(np.array([0.3, -0.1, 0.3]), np.array([0.5, 0.5, 0.7]))]
    return p_via, r_via, bp1, br1, erb, a_sets, b_sets


def test_blend_corners_path():
    """blend_corners: sub-vias on the clothoid, C1-ish tangents, containment."""
    from boundplanner_tpu.path.euler_spiral import blend_corners

    p_via, r_via, bp1, br1, erb, a_sets, b_sets = _corner_scene()
    n_sub = 4
    out = blend_corners(p_via, r_via, bp1, br1, erb, a_sets, b_sets,
                        length=0.05, n_sub=n_sub)
    p2, r2, bp1_2, br1_2, erb2, a2, b2 = out
    # corner replaced by n_sub+1 points
    assert len(p2) == 3 - 1 + (n_sub + 1)
    assert len(a2) == len(p2) - 1
    # endpoints unchanged
    np.testing.assert_allclose(p2[0], p_via[0])
    np.testing.assert_allclose(p2[-1], p_via[-1])
    # every via inside its segment's set (both adjacent segments checked)
    for i in range(len(p2) - 1):
        assert np.max(a2[i] @ p2[i] - b2[i]) <= 1e-8
        assert np.max(a2[i] @ p2[i + 1] - b2[i]) <= 1e-8
    # tangent discontinuity at each interior sub-corner is ~theta/n_sub,
    # far below the original right angle
    dirs = [(p2[i + 1] - p2[i]) / np.linalg.norm(p2[i + 1] - p2[i])
            for i in range(len(p2) - 1)]
    turns = [np.arccos(np.clip(np.dot(dirs[i], dirs[i + 1]), -1, 1))
             for i in range(len(dirs) - 1)]
    assert max(turns) < (np.pi / 2) / n_sub + 0.1
    # total turn preserved
    assert abs(sum(turns) - np.pi / 2) < 1e-6


def test_blend_corners_skips_tight_sets():
    """A corner whose spiral would leave the sets stays sharp."""
    from boundplanner_tpu.path.euler_spiral import blend_corners

    p_via, r_via, bp1, br1, erb, a_sets, b_sets = _corner_scene()
    # shrink set 0 so its corridor ends EXACTLY at the corner: the blend's
    # inward cut would leave it
    eye = np.eye(3)
    b_sets = [np.concatenate([[0.4, 1e-6, 0.7], -np.array([-0.1, -1e-6, 0.3]),
                              10.0 * np.ones(9)]),
              b_sets[1]]
    out = blend_corners(p_via, r_via, bp1, br1, erb, a_sets, b_sets,
                        length=0.05, n_sub=4)
    assert len(out[0]) == 3  # unchanged


def test_build_path_spiral_blend_tracks():
    """An MPC closed loop over a spiral-blended path keeps tracking."""
    import jax.numpy as jnp

    from boundplanner_tpu.config import MPCParams
    from boundplanner_tpu.mpc import MPCNode

    p_via, r_via, bp1, br1, erb, a_sets, b_sets = _corner_scene()
    # pad sets to 15 rows is already satisfied (15 rows each)
    cfg = MPCParams(sqp_iters=3, qp_iters=8, line_search_steps=3,
                    warm_shift=True, manual_jac=True)
    from boundplanner_tpu.robot.model import RobotModel
    m = RobotModel()
    q0 = m.inverse_kinematics(p_via[0], r_via[0], np.array(
        [0.0, 0.6, 0.0, -1.6, 0.0, 0.9, 0.0]))
    node = MPCNode(q0, params=cfg)
    # spiral_sub=2 keeps sub-segments ~0.05 m: with n_sub=4 the 0.025 m
    # sub-segments shrink the nr_segs=4 window to ~0.1 m of lookahead
    # against a 1.5 s horizon and the solve wedges on the window cap
    # (measured: 16/30 failed ticks at n_sub=4 vs 0 at n_sub=2)
    node.update_reference(p_via, r_via, bp1, br1, erb, a_sets, b_sets,
                          obstacles=[], spiral_blend=0.05, spiral_sub=2)
    # the blended path exists and is longer in via count
    assert int(node.mpc.carry.path.num_sectors) > 1
    for _ in range(45):
        node.step()
        if float(node.mpc.phi_current[0]) > float(node.mpc.phi_max[0]) - 0.005:
            break
    assert float(node.mpc.phi_current[0]) > float(node.mpc.phi_max[0]) - 0.03, (
        f"did not near path end: phi {float(node.mpc.phi_current[0])}"
        f"/{float(node.mpc.phi_max[0])}"
    )
    assert np.linalg.norm(node.p_lie[:3] - p_via[-1]) < 0.05
    assert sum(node.fails) <= 2
