"""Manual chain-rule OCP Jacobians vs jacfwd(evaluate) in float64."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boundplanner_tpu.config import MPCParams
from boundplanner_tpu.demo import demo_scene
from boundplanner_tpu.mpc import ocp, ocp_jac
from boundplanner_tpu.mpc.bound_mpc import build_tick_params


def tick_params(cfg):
    carry, meas, obs, q0 = demo_scene(cfg, dtype=np.float64)
    params = build_tick_params(carry, meas, obs, cfg)[0]
    return jax.tree.map(jnp.asarray, params)


@pytest.fixture(scope="module")
def setup():
    cfg = MPCParams()
    params = tick_params(cfg)
    rng = np.random.default_rng(11)
    nx = ocp.n_vars(cfg.n)
    xs = [np.zeros(nx), rng.normal(size=nx) * 0.3]
    return cfg, params, xs


def test_values_match(setup):
    cfg, params, xs = setup
    for x in xs:
        x = jnp.asarray(x)
        r0, g0 = ocp.evaluate(x, params, cfg)
        r1, g1, _, _ = ocp_jac.evaluate_with_jac(x, params, cfg)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=1e-12)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-12)


def test_jacobians_match(setup):
    cfg, params, xs = setup
    jac = jax.jacfwd(lambda x: ocp.evaluate(x, params, cfg))
    for x in xs:
        x = jnp.asarray(x)
        jr0, jg0 = jac(x)
        _, _, jr1, jg1 = ocp_jac.evaluate_with_jac(x, params, cfg)
        np.testing.assert_allclose(np.asarray(jr1), np.asarray(jr0), atol=1e-8)
        np.testing.assert_allclose(np.asarray(jg1), np.asarray(jg0), atol=1e-8)


def test_solver_manual_jac_matches(setup):
    """solve_sqp with manual_jac=True reproduces the default solution."""
    import dataclasses
    from boundplanner_tpu.demo import demo_scene
    from boundplanner_tpu.mpc.bound_mpc import mpc_tick

    cfg = MPCParams(sqp_iters=4, qp_iters=10, line_search_steps=4)
    cfg_m = dataclasses.replace(cfg, manual_jac=True)
    carry, meas, obs, q0 = demo_scene(cfg, dtype=np.float64)
    _, out0 = mpc_tick(carry, meas, obs, cfg)
    _, out1 = mpc_tick(carry, meas, obs, cfg_m)
    np.testing.assert_allclose(
        np.asarray(out1["q"]), np.asarray(out0["q"]), atol=1e-9
    )
    np.testing.assert_allclose(float(out1["cost"]), float(out0["cost"]), rtol=1e-9)
