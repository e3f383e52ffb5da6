"""Randomized-scene fleet: plan a few scenes, roll out batched + sharded."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boundplanner_tpu.config import MPCParams
from boundplanner_tpu.parallel.batch import closed_loop_rollout
from boundplanner_tpu.parallel.fleet import build_fleet
from boundplanner_tpu.parallel.mesh import make_mesh, shard_batch

CFG = MPCParams(sqp_iters=3, qp_iters=8, line_search_steps=3)


@pytest.mark.slow
def test_fleet_rollout_sharded():
    batch = 8
    carry_b, q0_b, obs_b = build_fleet(batch, CFG, n_obstacles=2, seed=0,
                                       dtype=np.float64)
    mesh = make_mesh(8)
    carry_b = shard_batch(carry_b, mesh)
    q0_b = shard_batch(jnp.asarray(q0_b), mesh)
    obs_b = shard_batch(obs_b, mesh)

    roll = jax.jit(
        lambda c, q, o: jax.vmap(
            lambda cc, qq, oo: closed_loop_rollout(cc, qq, oo, CFG, 8)
        )(c, q, o)
    )
    final, recs = roll(carry_b, q0_b, obs_b)
    phis = np.asarray(recs["phi"])  # (B, T)
    assert phis.shape == (batch, 8)
    assert np.isfinite(phis).all()
    # most scenes make progress along their paths
    assert np.mean(phis[:, -1] > 0.005) >= 0.5
    assert np.isfinite(np.asarray(recs["q"])).all()


def test_chunked_rollout_matches_vmap():
    """Chunked fleet rollout must equal the plain vmapped rollout."""
    import jax
    import jax.numpy as jnp
    from boundplanner_tpu.demo import demo_scene, stack_scenes
    from boundplanner_tpu.parallel.batch import chunked_rollout

    cfg = MPCParams(sqp_iters=2, qp_iters=6, line_search_steps=2)
    carry, meas, obs, q0 = demo_scene(cfg, dtype=np.float64)
    batch = 8
    cb, mb, ob = stack_scenes(carry, meas, obs, batch)
    q0b = np.broadcast_to(np.asarray(q0, np.float64), (batch, 7)).copy()

    roll = jax.jit(lambda c, q, o: jax.vmap(
        lambda cc, qq, oo: closed_loop_rollout(cc, qq, oo, cfg, 4))(c, q, o))
    _, recs_ref = roll(cb, jnp.asarray(q0b), ob)

    _, recs_chunk = jax.jit(
        lambda c, q, o: chunked_rollout(c, q, o, cfg, 4, chunk=4)
    )(cb, jnp.asarray(q0b), ob)

    np.testing.assert_allclose(
        np.asarray(recs_chunk["phi"]), np.asarray(recs_ref["phi"]), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(recs_chunk["q"]), np.asarray(recs_ref["q"]), atol=1e-12
    )
