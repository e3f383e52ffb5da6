"""Tiny self-contained demo scene builders (no solver calls) used by
``__graft_entry__`` and ``bench.py``."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .config import MPCParams
from .mpc.bound_mpc import init_carry
from .path.reference_path import build_path
from .planner.set_finder import build_obstacle_arrays
from .robot import kinematics as kin

DEMO_Q0 = np.array([0.0, 0.0, 0.0, -np.pi / 2, 0.0, np.pi / 2, 0.0])


def demo_scene(cfg: MPCParams, dtype=jnp.float32, goal_offset=(0.0, -0.3, 0.0)):
    """A single tracking scene: straight-line path from the FK pose of the
    demo configuration, one box obstacle off to the side."""
    from scipy.spatial.transform import Rotation as R

    q0 = DEMO_Q0.copy()
    pose0 = np.array(kin.fk_pose(jnp.asarray(q0)), dtype=np.float64)
    p0 = pose0[:3]
    r0 = R.from_rotvec(pose0[3:]).as_matrix()

    p_via = [p0.copy(), p0 + np.asarray(goal_offset)]
    r_via = [r0, r0]
    bp1 = [np.array([0.0, 0.0, 1.0])]
    br1 = [np.array([0.0, 0.0, 1.0])]
    e_r_bound = [np.array([90, 90, 90, -90, -90, -90]) * np.pi / 180]
    a_sets = [np.zeros((15, 3))]
    b_sets = [np.ones(15)]

    path = build_path(
        p_via, r_via, bp1, br1, e_r_bound, a_sets, b_sets, nr_segs=cfg.nr_segs
    )
    path = jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, path
    )
    carry = init_carry(path, jnp.asarray(pose0, dtype), cfg, dtype)

    obstacles = [[0.7, -0.2, 0.0, 0.9, 0.0, 0.4]]
    obs = build_obstacle_arrays(obstacles)
    obs = jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, obs
    )

    meas = {
        "q0": jnp.asarray(q0, dtype),
        "dq0": jnp.zeros(7, dtype),
        "ddq0": jnp.zeros(7, dtype),
        "p0": jnp.asarray(pose0, dtype),
        "v0": jnp.zeros(6, dtype),
        "u0": jnp.zeros(7, dtype),
        "qf": jnp.asarray(q0, dtype),
    }
    return carry, meas, obs, np.asarray(q0)


def stack_scenes(carry, meas, obs, batch: int):
    """Replicate a single scene into a batch (leading scenario axis)."""
    tile = lambda x: jnp.broadcast_to(x, (batch,) + x.shape)
    return (
        jax.tree.map(tile, carry),
        jax.tree.map(tile, meas),
        jax.tree.map(tile, obs),
    )
