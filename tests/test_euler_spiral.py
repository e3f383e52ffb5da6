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
