"""Convex set construction tests (device kernels)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boundplanner_tpu.planner.set_finder import (
    ObstacleArrays,
    build_obstacle_arrays,
    find_set_line,
    find_set_around_point,
)

WS_MIN = jnp.array([-1.0, -1.0, 0.0])
WS_MAX = jnp.array([1.0, 1.0, 1.2])


def simple_scene():
    # one box obstacle between start and goal region
    obstacles = [
        [0.3, -0.2, 0.0, 0.5, 0.2, 0.6],
        [-0.8, -0.8, 0.0, -0.6, -0.6, 0.3],
    ]
    return build_obstacle_arrays(obstacles, size_increase=0.0)


def test_find_set_line_separates():
    obs = simple_scene()
    p0 = jnp.array([0.0, 0.0, 0.3])
    p1 = jnp.array([0.1, 0.0, 0.3])
    a, b, collision = find_set_line(p0, p1, obs, 0.7, WS_MIN, WS_MAX)
    a, b = np.asarray(a), np.asarray(b)
    assert not bool(collision)
    # segment endpoints inside the set
    assert np.max(a @ np.asarray(p0) - b) <= 1e-9
    assert np.max(a @ np.asarray(p1) - b) <= 1e-9
    # the obstacle interior must be excluded: its center violates some row
    center = np.array([0.4, 0.0, 0.3])
    assert np.max(a @ center - b) > 0


def test_find_set_line_collision_flag():
    obs = simple_scene()
    # segment piercing the first obstacle
    p0 = jnp.array([0.4, 0.0, 0.3])
    p1 = jnp.array([0.4, 0.05, 0.3])
    a, b, collision = find_set_line(p0, p1, obs, 0.7, WS_MIN, WS_MAX)
    assert bool(collision)


def test_find_set_line_no_obstacles():
    obs = build_obstacle_arrays([], size_increase=0.0)
    p0 = jnp.array([0.0, 0.0, 0.5])
    p1 = jnp.array([0.2, 0.0, 0.5])
    a, b, collision = find_set_line(p0, p1, obs, 0.7, WS_MIN, WS_MAX)
    a, b = np.asarray(a), np.asarray(b)
    assert not bool(collision)
    # only the init box is active; padded rows inactive
    assert np.all(b[6:] >= 9.99)
    assert np.max(a @ np.asarray(p0) - b) <= 1e-9


def test_find_set_around_point():
    obs = simple_scene()
    p_seed = jnp.array([0.0, 0.0, 0.5])
    a, b, shape, center, ok = find_set_around_point(p_seed, obs, WS_MIN, WS_MAX)
    a, b = np.asarray(a), np.asarray(b)
    # seed stays inside
    assert np.max(a @ np.asarray(p_seed) - b) <= 1e-7
    # obstacle centers excluded
    for c in ([0.4, 0.0, 0.3], [-0.7, -0.7, 0.15]):
        assert np.max(a @ np.array(c) - b) > -1e-6
    # ellipsoid inside polytope: ||L^T a_i|| + a_i^T d <= b_i for active rows
    l_mat = np.linalg.cholesky(np.asarray(shape) + 1e-12 * np.eye(3))
    active = b < 9.0
    margins = b[active] - a[active] @ np.asarray(center) - np.linalg.norm(
        a[active] @ l_mat, axis=1
    )
    assert margins.min() > -1e-5
    # a reasonable volume was found (not collapsed)
    assert np.linalg.det(np.asarray(shape)) > 1e-4


def test_find_set_around_point_fixed_mid():
    obs = simple_scene()
    p_seed = jnp.array([0.1, 0.3, 0.5])
    a, b, shape, center, ok = find_set_around_point(
        p_seed, obs, WS_MIN, WS_MAX, fixed_mid=True
    )
    a, b = np.asarray(a), np.asarray(b)
    assert np.max(a @ np.asarray(p_seed) - b) <= 1e-7
    assert np.linalg.det(np.asarray(shape)) > 1e-5


def test_find_set_line_vmapped_links():
    """6 link sets per MPC tick in one vmap (ref `BoundMPC.py:480-498`)."""
    obs = simple_scene()
    p0s = jnp.asarray(np.array([[0.0, 0.0, 0.3 + 0.05 * i] for i in range(6)]))
    p1s = p0s + jnp.asarray(np.array([[0.05, 0.0, 0.0]] * 6))
    fn = jax.vmap(lambda p0, p1: find_set_line(p0, p1, obs, 0.7, WS_MIN, WS_MAX))
    a, b, coll = jax.jit(fn)(p0s, p1s)
    assert a.shape == (6, 15, 3) and b.shape == (6, 15)
    for i in range(6):
        assert np.max(np.asarray(a[i]) @ np.asarray(p0s[i]) - np.asarray(b[i])) <= 1e-8


def test_find_set_around_line():
    from boundplanner_tpu.planner.set_finder import find_set_around_line
    obs = simple_scene()
    p0 = jnp.array([0.0, 0.3, 0.5])
    dp1 = jnp.array([0.15, 0.0, 0.0])
    a, b, shape, center, ok = find_set_around_line(p0, dp1, obs, WS_MIN, WS_MAX)
    a, b = np.asarray(a), np.asarray(b)
    # both endpoints inside
    assert np.max(a @ np.asarray(p0) - b) <= 1e-6
    assert np.max(a @ np.asarray(p0 + dp1) - b) <= 1e-6
    # obstacle centers excluded
    assert np.max(a @ np.array([0.4, 0.0, 0.3]) - b) > -1e-6
