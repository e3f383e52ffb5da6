"""Generic Gauss-Newton SQP engine vs scipy SLSQP on analytic NLPs."""

import numpy as np
import pytest
import scipy.optimize as sopt

import jax
import jax.numpy as jnp

from boundplanner_tpu.ops.sqp import gauss_newton_sqp


def test_rosenbrock_style_constrained():
    """min (1-x)^2 + 5(y-x^2)^2  s.t.  x + y <= 1, x,y >= -2."""

    def eval_fn(z):
        x, y = z[0], z[1]
        r = jnp.stack([1.0 - x, jnp.sqrt(5.0) * (y - x * x)])
        g = jnp.stack([x + y - 1.0, -x - 2.0, -y - 2.0])
        return r, g

    res = gauss_newton_sqp(eval_fn, jnp.zeros(2), iters=30, qp_iters=20,
                           line_search_steps=8)
    ref = sopt.minimize(
        lambda z: (1 - z[0]) ** 2 + 5 * (z[1] - z[0] ** 2) ** 2,
        np.zeros(2),
        constraints=[{"type": "ineq", "fun": lambda z: 1 - z[0] - z[1]}],
        bounds=[(-2, None), (-2, None)],
        method="SLSQP",
    )
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.x)[:2] * 0 + np.asarray(res.x),
                               np.asarray(res.x))  # shape sanity
    np.testing.assert_allclose(np.asarray(res.x), ref.x, atol=2e-4)
    np.testing.assert_allclose(float(res.cost), ref.fun, atol=1e-5)


def test_projection_nlp():
    """min |z - c|^2 s.t. |z|^2 <= 1  — projection onto the unit ball
    (nonlinear constraint)."""
    c = np.array([2.0, 1.0, -1.0])

    def eval_fn(z):
        r = z - jnp.asarray(c)
        g = jnp.stack([jnp.sum(z * z) - 1.0])
        return r, g

    res = gauss_newton_sqp(eval_fn, jnp.zeros(3), iters=30, qp_iters=20,
                           line_search_steps=8, viol_tol=1e-6)
    assert bool(res.success)
    expect = c / np.linalg.norm(c)
    np.testing.assert_allclose(np.asarray(res.x), expect, atol=1e-4)


def test_vmapped_batch():
    """The engine stays correct under vmap (lockstep batches)."""
    cs = np.array([[2.0, 0.0], [0.0, 3.0], [1.5, 1.5], [0.3, 0.1]])

    def solve(c):
        def eval_fn(z):
            return z - c, jnp.stack([jnp.sum(z * z) - 1.0])

        return gauss_newton_sqp(eval_fn, jnp.zeros(2), iters=25, qp_iters=15,
                                line_search_steps=6).x

    xs = np.asarray(jax.jit(jax.vmap(solve))(jnp.asarray(cs)))
    for c, x in zip(cs, xs):
        n = np.linalg.norm(c)
        expect = c / n if n > 1 else c
        np.testing.assert_allclose(x, expect, atol=2e-4)


def test_infeasible_reports_failure():
    """Inconsistent constraints -> success=False, best-effort x."""

    def eval_fn(z):
        r = z
        g = jnp.stack([z[0] - (-1.0), -z[0] + 1.0])  # z0 <= -1 and z0 >= 1
        return r, g

    res = gauss_newton_sqp(eval_fn, jnp.zeros(1), iters=15, qp_iters=15,
                           line_search_steps=5)
    assert not bool(res.success)
    assert float(res.viol) > 0.5


def test_admm_backend_matches():
    """qp_solver="admm" reaches the same constrained optimum (ball
    projection) as the IPM backend."""
    c = np.array([2.0, 1.0, -1.0])

    def eval_fn(z):
        return z - jnp.asarray(c), jnp.stack([jnp.sum(z * z) - 1.0])

    res = gauss_newton_sqp(eval_fn, jnp.zeros(3), iters=30,
                           line_search_steps=8, viol_tol=1e-5,
                           qp_solver="admm", admm_iters=200)
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.x), c / np.linalg.norm(c),
                               atol=1e-3)
