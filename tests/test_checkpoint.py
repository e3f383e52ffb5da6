"""Checkpoint/resume: a restored carry continues bit-exactly."""

import numpy as np
import pytest

import jax.numpy as jnp

from boundplanner_tpu.checkpoint import load_carry, save_carry
from boundplanner_tpu.config import MPCParams
from boundplanner_tpu.demo import demo_scene
from boundplanner_tpu.mpc.bound_mpc import mpc_tick

CFG = MPCParams(sqp_iters=2, qp_iters=6, line_search_steps=2)


def test_roundtrip(tmp_path):
    carry, meas, obs, _ = demo_scene(CFG, dtype=np.float64)
    carry2, out = mpc_tick(carry, meas, obs, CFG)

    f = tmp_path / "carry.npz"
    save_carry(f, carry2)
    restored = load_carry(f)

    # resumed state drives the next tick identically
    c_a, out_a = mpc_tick(carry2, meas, obs, CFG)
    c_b, out_b = mpc_tick(restored, meas, obs, CFG)
    np.testing.assert_allclose(np.asarray(out_a["q"]), np.asarray(out_b["q"]), atol=0)
    np.testing.assert_allclose(
        np.asarray(out_a["phi"]), np.asarray(out_b["phi"]), atol=0
    )
