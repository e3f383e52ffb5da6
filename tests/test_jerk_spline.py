"""Jerk spline evaluators vs a direct numpy transcription of the
reference's closed forms (`jerk_trajectory_casadi.py`) and vs the one-step
integrator."""

import numpy as np
import pytest

import jax.numpy as jnp

from boundplanner_tpu.utils.jerk_spline import eval_spline
from boundplanner_tpu.utils.integration import integrate_jerk_step


def ref_eval(u, h, t, q0=0.0, v0=0.0, a0=0.0):
    """Numpy oracle: dense numerical integration of the hat-interpolated jerk."""
    ts = np.linspace(0.0, t, 20001)
    m = len(u)

    def jerk(s):
        j = np.clip(int(np.floor(s / h)), 0, m - 2)
        tau = s - j * h
        return u[j] + (u[j + 1] - u[j]) / h * tau

    js = np.array([jerk(s) for s in ts])
    a = a0 + np.trapezoid(js, ts)
    a_traj = a0 + np.concatenate([[0], np.cumsum((js[1:] + js[:-1]) / 2 * np.diff(ts))])
    v = v0 + np.trapezoid(a_traj, ts)
    v_traj = v0 + np.concatenate([[0], np.cumsum((a_traj[1:] + a_traj[:-1]) / 2 * np.diff(ts))])
    q = q0 + np.trapezoid(v_traj, ts)
    return a, v, q


def test_spline_vs_numeric_integration(rng):
    h = 0.1
    u = rng.normal(size=6)
    for t in [0.05, 0.1, 0.23, 0.5]:
        jerk, a, v, q = eval_spline(jnp.asarray(u), h, t, q0=0.3, v0=-0.2, a0=0.5)
        a_ref, v_ref, q_ref = ref_eval(u, h, t, q0=0.3, v0=-0.2, a0=0.5)
        np.testing.assert_allclose(float(a), a_ref, atol=1e-6)
        np.testing.assert_allclose(float(v), v_ref, atol=1e-6)
        np.testing.assert_allclose(float(q), q_ref, atol=1e-6)


def test_step_matches_spline_at_dt(rng):
    """integrate_jerk_step must equal the spline at t = h — the OCP and the
    simulator share the same discrete dynamics (ref
    `casadi_ocp_formulation.py:106-120` vs `util_functions.py:53-63`)."""
    h = 0.1
    u = rng.normal(size=(4, 7))
    q0, v0, a0 = rng.normal(size=7), rng.normal(size=7), rng.normal(size=7)
    _, a, v, q = eval_spline(jnp.asarray(u), h, h, q0=jnp.asarray(q0),
                             v0=jnp.asarray(v0), a0=jnp.asarray(a0))
    q_s, v_s, a_s = integrate_jerk_step(q0, v0, a0, u[0], u[1], h)
    np.testing.assert_allclose(np.asarray(q), q_s, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v), v_s, atol=1e-12)
    np.testing.assert_allclose(np.asarray(a), a_s, atol=1e-12)


def test_jerk_interpolation():
    u = np.array([0.0, 1.0, 0.0])
    jerk, _, _, _ = eval_spline(jnp.asarray(u), 0.1, 0.05)
    assert float(jerk) == pytest.approx(0.5)
    jerk, _, _, _ = eval_spline(jnp.asarray(u), 0.1, 0.15)
    assert float(jerk) == pytest.approx(0.5)
