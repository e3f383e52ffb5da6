"""Warm-start shifting: the shifted vector reproduces the tail of the
previous rollout."""

import numpy as np

import jax.numpy as jnp

from boundplanner_tpu.config import MPCParams
from boundplanner_tpu.mpc import ocp


def test_shift_preserves_rollout_tail(rng):
    cfg = MPCParams()
    n = cfg.n
    nx = ocp.n_vars(n)
    x = jnp.asarray(rng.normal(size=nx) * 0.2)
    xs = ocp.shift_warm_start(x, cfg)
    assert xs.shape == x.shape
    o = 7 * (n - 1)
    u = np.asarray(x[:o]).reshape(n - 1, 7)
    u_s = np.asarray(xs[:o]).reshape(n - 1, 7)
    np.testing.assert_allclose(u_s[:-1], u[1:], atol=1e-12)
    np.testing.assert_allclose(u_s[-1], u[-1], atol=1e-12)
    # integrated slack offset advances by one trapezoid increment:
    # new rslacks[0] == old rslacks[1]
    _, dsl, rs0, drs, ps0, dps = ocp.unpack(x, jnp.zeros(7), n)
    rsl_old, psl_old = ocp.slack_trajectories(rs0, drs, ps0, dps, cfg.dt)
    _, _, rs0_s, drs_s, ps0_s, dps_s = ocp.unpack(xs, jnp.zeros(7), n)
    rsl_new, psl_new = ocp.slack_trajectories(rs0_s, drs_s, ps0_s, dps_s, cfg.dt)
    np.testing.assert_allclose(float(rsl_new[0]), float(rsl_old[1]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(rsl_new[:-1]), np.asarray(rsl_old[1:]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(psl_new[:-1]), np.asarray(psl_old[1:]), atol=1e-12)
