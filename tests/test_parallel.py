"""Scenario batching + device-mesh sharding tests (8 virtual CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boundplanner_tpu.config import MPCParams
from boundplanner_tpu.demo import demo_scene, stack_scenes
from boundplanner_tpu.mpc.bound_mpc import mpc_tick
from boundplanner_tpu.parallel.mesh import make_mesh, shard_batch

CFG = MPCParams(sqp_iters=3, qp_iters=8, line_search_steps=3)


def test_eight_devices_present():
    assert len(jax.devices()) >= 8


@pytest.fixture(scope="module")
def batch_scene():
    carry, meas, obs, _ = demo_scene(CFG, dtype=jnp.float64)
    return stack_scenes(carry, meas, obs, 8)


def test_vmapped_tick_matches_single(batch_scene):
    carry_b, meas_b, obs_b = batch_scene
    single_carry = jax.tree.map(lambda x: x[0], carry_b)
    single_meas = jax.tree.map(lambda x: x[0], meas_b)
    single_obs = jax.tree.map(lambda x: x[0], obs_b)

    c1, o1 = mpc_tick(single_carry, single_meas, single_obs, CFG)
    cb, ob = jax.vmap(lambda c, m, o: mpc_tick(c, m, o, CFG))(carry_b, meas_b, obs_b)
    np.testing.assert_allclose(
        np.asarray(ob["q"][3]), np.asarray(o1["q"]), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(ob["phi"][5]), np.asarray(o1["phi"]), atol=1e-8
    )


def test_sharded_tick(batch_scene):
    carry_b, meas_b, obs_b = batch_scene
    mesh = make_mesh(8)
    carry_s = shard_batch(carry_b, mesh)
    meas_s = shard_batch(meas_b, mesh)
    obs_s = shard_batch(obs_b, mesh)

    @jax.jit
    def step(c, m, o):
        nc, out = jax.vmap(lambda cc, mm, oo: mpc_tick(cc, mm, oo, CFG))(c, m, o)
        return out["phi"], jnp.mean(out["success"].astype(jnp.float32))

    phis, frac = step(carry_s, meas_s, obs_s)
    assert phis.shape == (8, CFG.n)
    assert np.isfinite(np.asarray(phis)).all()
    # sharded result matches unsharded
    phis_ref, _ = step(carry_b, meas_b, obs_b)
    np.testing.assert_allclose(np.asarray(phis), np.asarray(phis_ref), atol=1e-9)


def test_closed_loop_rollout():
    from boundplanner_tpu.parallel.batch import closed_loop_rollout

    carry, meas, obs, q0 = demo_scene(CFG, dtype=jnp.float64)
    final, recs = closed_loop_rollout(
        carry, jnp.asarray(q0, jnp.float64), obs, CFG, n_ticks=5
    )
    phis = np.asarray(recs["phi"])
    assert phis.shape == (5,)
    assert phis[-1] > phis[0] - 1e-9  # progress (or at least no regression)
    assert np.isfinite(np.asarray(recs["q"])).all()
