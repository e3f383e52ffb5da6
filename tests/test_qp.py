"""QP interior-point solver tests against scipy oracles.

Acceptance criterion of the build plan: KKT residuals < 1e-6 vs reference
solvers on golden instances (SURVEY.md Phase 2).
"""

import numpy as np
import pytest
import scipy.optimize as sopt

import jax
import jax.numpy as jnp

from boundplanner_tpu.ops.qp import (
    solve_qp,
    solve_projection,
    solve_line_projection,
    solve_feasibility,
)

SOLVE_QP = jax.jit(solve_qp)


def random_qp(rng, n=6, m=12):
    a = rng.normal(size=(n, n))
    p = a @ a.T + 0.1 * np.eye(n)
    q = rng.normal(size=n)
    g = rng.normal(size=(m, n))
    x_feas = rng.normal(size=n) * 0.1
    h = g @ x_feas + rng.uniform(0.05, 1.0, size=m)  # strictly feasible
    return p, q, g, h


def scipy_qp(p, q, g, h):
    n = q.shape[0]
    res = sopt.minimize(
        lambda x: 0.5 * x @ p @ x + q @ x,
        np.zeros(n),
        jac=lambda x: p @ x + q,
        constraints=[{"type": "ineq", "fun": lambda x: h - g @ x, "jac": lambda x: -g}],
        method="SLSQP",
        options={"maxiter": 200, "ftol": 1e-12},
    )
    return res.x


def test_qp_vs_scipy(rng):
    for _ in range(20):
        p, q, g, h = random_qp(rng)
        sol = SOLVE_QP(*[jnp.asarray(v) for v in (p, q, g, h)])
        x_ref = scipy_qp(p, q, g, h)
        assert bool(sol.success)
        np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=1e-5)
        # KKT residuals
        assert float(sol.r_d) < 1e-6
        assert float(sol.r_p) < 1e-8
        assert float(sol.gap) < 1e-7


def test_qp_active_constraints(rng):
    """Equality-like: tight box around the unconstrained optimum."""
    p = 2.0 * np.eye(3)
    q = np.array([-2.0, -4.0, 2.0])  # unconstrained opt (1, 2, -1)
    g = np.vstack([np.eye(3), -np.eye(3)])
    h = np.array([0.5, 0.5, 0.5, 0.5, 0.5, 0.5])
    sol = SOLVE_QP(*[jnp.asarray(v) for v in (p, q, g, h)])
    np.testing.assert_allclose(np.asarray(sol.x), [0.5, 0.5, -0.5], atol=1e-7)


def test_qp_vmap(rng):
    ps, qs, gs, hs = [], [], [], []
    refs = []
    for _ in range(8):
        p, q, g, h = random_qp(rng, n=4, m=10)
        ps.append(p), qs.append(q), gs.append(g), hs.append(h)
        refs.append(scipy_qp(p, q, g, h))
    batched = jax.jit(jax.vmap(solve_qp))
    sol = batched(
        jnp.asarray(np.array(ps)),
        jnp.asarray(np.array(qs)),
        jnp.asarray(np.array(gs)),
        jnp.asarray(np.array(hs)),
    )
    np.testing.assert_allclose(np.asarray(sol.x), np.array(refs), atol=1e-5)


def test_projection(rng):
    """Project a point onto a padded 15-row set (the per-obstacle projection
    of `ConvexSetFinder.py:465-489`)."""
    g = np.vstack([np.eye(3), -np.eye(3), np.zeros((9, 3))])
    h = np.concatenate([0.5 * np.ones(6), 10 * np.ones(9)])
    target = np.array([2.0, 0.1, -3.0])
    sol = solve_projection(jnp.asarray(g), jnp.asarray(h), jnp.asarray(target))
    np.testing.assert_allclose(np.asarray(sol.x), [0.5, 0.1, -0.5], atol=1e-7)


def test_line_projection():
    """Closest point between a segment and a box (ref `ConvexSetFinder.py:52-99`)."""
    g = np.vstack([np.eye(3), -np.eye(3)])
    h = 0.5 * np.ones(6)
    p0 = np.array([2.0, 0.0, 0.0])
    p1 = np.array([2.0, 4.0, 0.0])
    x, phi, sol = solve_line_projection(
        jnp.asarray(g), jnp.asarray(h), jnp.asarray(p0), jnp.asarray(p1)
    )
    # optimum is non-unique (a face segment); check optimal distance and
    # consistency instead of a particular minimizer
    x = np.asarray(x)
    phi = float(phi)
    p_seg = p0 + phi * (p1 - p0)
    np.testing.assert_allclose(np.linalg.norm(p_seg - x), 1.5, atol=1e-5)
    assert np.max(g @ x - h) < 1e-6
    assert -1e-8 <= phi <= 1 + 1e-8


def test_feasibility_feasible():
    g = np.vstack([np.eye(3), -np.eye(3)])
    h = np.ones(6)
    x, t, sol = solve_feasibility(jnp.asarray(g), jnp.asarray(h))
    assert float(t) < 0  # strictly feasible -> negative worst margin
    assert np.max(g @ np.asarray(x) - h) < 1e-6


def test_feasibility_infeasible():
    # x <= -1 and x >= 1 simultaneously
    g = np.array([[1.0, 0, 0], [-1.0, 0, 0]])
    h = np.array([-1.0, -1.0])
    x, t, sol = solve_feasibility(jnp.asarray(g), jnp.asarray(h))
    assert float(t) > 0.9  # violation ~1


def test_feasibility_unbounded_polytope():
    """Degenerate inputs (VERDICT r2 weak #6), both regimes of the
    `solve_feasibility` docstring.

    (a) Truly unbounded rows (nothing clamps the phase-1 t): the
        eps-regularized QP stays finite (never NaN/inf) but drifts to the
        -1/(2 eps) scale — useless, hence the caller invariant.
    (b) Planner-padded rows: the inactive padding rows (zero normal,
        b=10) read 0.x <= 10 + t and clamp t >= -10, so a padded problem
        is benign O(10) even without workspace rows."""
    # (a) one bare halfspace
    g1 = np.array([[1.0, 0.0, 0.0]])
    h1 = np.array([0.0])
    x, t, sol = solve_feasibility(jnp.asarray(g1), jnp.asarray(h1))
    x, t = np.asarray(x), float(t)
    assert np.all(np.isfinite(x)) and np.isfinite(t)
    assert t < -1e4 and np.linalg.norm(x) > 1e4  # detectably degenerate

    # (b) same halfspace + planner-style inactive padding rows
    g = np.zeros((8, 3))
    g[0] = [1.0, 0.0, 0.0]
    h = 10.0 * np.ones(8)
    h[0] = 0.0
    xp, tp, _ = solve_feasibility(jnp.asarray(g), jnp.asarray(h))
    np.testing.assert_allclose(float(tp), -10.0, atol=1e-6)
    assert np.linalg.norm(np.asarray(xp)) < 11.0

    # a bounding box restores a sane strictly-feasible answer
    g_box = np.vstack([g, np.eye(3), -np.eye(3)])
    h_box = np.concatenate([h, np.ones(6)])
    xb, tb, _ = solve_feasibility(jnp.asarray(g_box), jnp.asarray(h_box))
    assert -1.1 < float(tb) < 0 and np.linalg.norm(np.asarray(xb)) < 2.0


def test_planner_sets_carry_workspace_rows():
    """The caller-side boundedness invariant: every set emitted by the
    set finder starts from the 6 workspace box rows, so intersection/fit
    feasibility problems are always bounded (`solve_feasibility`
    docstring)."""
    from boundplanner_tpu.planner.set_finder import (
        build_obstacle_arrays, find_set_around_point)

    obs = build_obstacle_arrays([[0.25, -0.15, 0.0, 0.45, 0.15, 0.8]], 0.08)
    ws_min = jnp.asarray(np.array([-1.0, -1.0, 0.0]))
    ws_max = jnp.asarray(np.array([1.0, 1.0, 1.2]))
    a, b, *_ = find_set_around_point(
        jnp.asarray(np.array([-0.3, -0.4, 0.3])), obs, ws_min, ws_max,
        fixed_mid=False, n_rows=20,
    )
    a, b = np.asarray(a), np.asarray(b)
    # a bounded direction test: max <d, x> over {Ax<=b} is finite for all
    # +-e_i directions iff the rows bound the box directions
    for d in np.vstack([np.eye(3), -np.eye(3)]):
        res = sopt.linprog(-d, A_ub=a, b_ub=b, bounds=(None, None))
        assert res.status == 0, f"unbounded along {d}"


def test_lp_intersection(rng):
    """Set-intersection LP parity with scipy linprog (`BoundPlanner.py:774-787`)."""
    for _ in range(10):
        c0 = rng.normal(size=3)
        g = np.vstack([np.eye(3), -np.eye(3), rng.normal(size=(4, 3))])
        h = np.concatenate([np.ones(6), g[6:] @ c0 + rng.uniform(-0.2, 0.5, 4)])
        res = sopt.linprog(np.zeros(3), A_ub=g, b_ub=h, bounds=(None, None))
        x, t, sol = solve_feasibility(jnp.asarray(g), jnp.asarray(h))
        assert bool(float(t) < 1e-7) == bool(res.success)


def test_admm_vs_ipm(rng):
    """ADMM QP reaches the IPM solution on well-conditioned instances."""
    from boundplanner_tpu.ops.qp import solve_qp_admm

    for _ in range(8):
        p, q, g, h = random_qp(rng, n=8, m=16)
        x_ipm = np.asarray(SOLVE_QP(*[jnp.asarray(v) for v in (p, q, g, h)]).x)
        sol = solve_qp_admm(
            jnp.asarray(p), jnp.asarray(q), jnp.asarray(g), jnp.asarray(h),
            iters=400,
        )
        np.testing.assert_allclose(np.asarray(sol.x), x_ipm, atol=2e-3)
        assert float(sol.r_p) < 1e-4


def test_kkt_every_frozen_factor(rng):
    """kkt_every=2 (frozen-factor mode): primal-feasible and close to the
    exact-IPM solution only loosely (directions are inexact); vmap path
    works and matches the unbatched call.

    NOTE this is an experimental knob with a DOCUMENTED NEGATIVE RESULT at
    OCP scale (CPU obstacle closed-loop: 8 infeasibility fallbacks vs 0)
    — the stale-factor refinement does not contract when the barrier
    scaling w = z/s moves quickly. Default stays kkt_every=1.
    """
    xs = []
    for _ in range(4):
        p, q, g, h = random_qp(rng, n=8, m=16)
        args = [jnp.asarray(v) for v in (p, q, g, h)]
        x_ref = np.asarray(SOLVE_QP(*args).x)
        sol = solve_qp(*args, iters=30, kkt_every=2)
        # contract: always primal-feasible and finite; optimality is only
        # approximate (this is exactly why the knob failed its gate)
        assert float(sol.r_p) < 1e-6
        assert np.all(np.isfinite(np.asarray(sol.x)))
        assert np.linalg.norm(np.asarray(sol.x) - x_ref) < 1.0
        xs.append((args, sol))
    # batched path
    (args, sol0) = xs[0]
    batched = jax.vmap(
        lambda p, q, g, h: solve_qp(p, q, g, h, iters=30, kkt_every=2)
    )(*[jnp.stack([a] * 3) for a in args])
    np.testing.assert_allclose(
        np.asarray(batched.x[0]), np.asarray(sol0.x), rtol=1e-6, atol=1e-8
    )


def test_low_precision_direction_modes_converge(rng):
    """lowp / lowp_rd (bfloat16 streams with f32 accumulation) still
    converge to the f32 solution within line-search-absorbable error."""
    import jax.numpy as jnp
    from boundplanner_tpu.ops.qp import solve_qp

    for _ in range(5):
        n, m = 16, 40
        a = rng.normal(size=(n, n))
        p = jnp.asarray((a @ a.T + 0.5 * np.eye(n)).astype(np.float32))
        q = jnp.asarray(rng.normal(size=n).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(m, n)).astype(np.float32))
        h = jnp.asarray(rng.uniform(0.1, 1.0, m).astype(np.float32))
        ref = solve_qp(p, q, g, h, iters=15)
        low = solve_qp(p, q, g, h, iters=15, lowp=True, lowp_rd=True)
        # bf16 direction streams leave ~1e-3-scale residuals on these
        # unit-scale random instances (bounded, non-accumulating); inside
        # the SQP the merit line search and slacks absorb this — the
        # closed-loop fleet gates show identical quality. This test pins
        # the expected error SCALE so a silent blowup would be caught.
        assert float(low.r_p) < 5e-3
        np.testing.assert_allclose(
            np.asarray(low.x), np.asarray(ref.x), atol=5e-2
        )
