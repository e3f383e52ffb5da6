"""Batched SQP solver for the condensed BoundMPC OCP.

Fills the role of Ipopt in the reference (`BoundMPC.py:594-603`): each tick
solves the nonconvex tracking NLP to the same tolerance class. Design:

- Gauss-Newton SQP: B = 2 J_r^T J_r from the exact residual Jacobian
  (``jax.jacfwd`` — the objective is written exactly as a sum of squares,
  so B carries the full cost curvature), exact constraint linearization.
- QP subproblem solved by the dense predictor-corrector IPM of
  ``ops.qp`` — all matmuls/Cholesky, MXU-shaped.
- l1-merit backtracking line search with a fixed trial fan (evaluated with
  one ``vmap``), Levenberg damping adaptation on rejection.
- Fixed trip count with masked updates after convergence, so a ``vmap``
  over scenes stays in lockstep on TPU.

The whole solve is one jitted function; warm starting carries the previous
decision vector exactly like the reference carries ``prev_solution``
(`BoundMPC.py:193-198,412-428`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MPCParams
from ..ops.qp import solve_qp
from . import ocp


class SQPResult(NamedTuple):
    x: jax.Array
    cost: jax.Array
    viol: jax.Array       # max constraint violation
    iters: jax.Array      # SQP iterations actually used
    success: jax.Array


def _merit(x, params, cfg, nu):
    c = ocp.cost(x, params, cfg)
    g = ocp.constraints(x, params, cfg)
    return c + nu * jnp.sum(jnp.maximum(g, 0.0)), c, g


@functools.partial(jax.jit, static_argnames=("cfg",))
def solve_sqp(x0, params, cfg: MPCParams) -> SQPResult:
    nu = jnp.asarray(cfg.merit_penalty, x0.dtype)
    n_x = x0.shape[0]
    eye = jnp.eye(n_x, dtype=x0.dtype)

    res_jac = jax.jacfwd(lambda x: ocp.cost_residuals(x, params, cfg))
    cons_jac = jax.jacfwd(lambda x: ocp.constraints(x, params, cfg))

    alphas = 2.0 ** -jnp.arange(cfg.line_search_steps, dtype=x0.dtype)

    def body(it, carry):
        x, lam, merit_prev, done, used = carry

        r = ocp.cost_residuals(x, params, cfg)
        jr = res_jac(x)
        g = ocp.constraints(x, params, cfg)
        jg = cons_jac(x)

        grad = 2.0 * jr.T @ r
        hess = 2.0 * jr.T @ jr + lam * eye

        qp = solve_qp(hess, grad, jg, -g, iters=cfg.qp_iters, tol=1e-10)
        d = qp.x

        # l1-merit line search over a fixed trial fan
        cand = x[None, :] + alphas[:, None] * d[None, :]
        merits = jax.vmap(lambda xx: _merit(xx, params, cfg, nu)[0])(cand)
        merits = jnp.where(jnp.isfinite(merits), merits, jnp.inf)
        best = jnp.argmin(merits)
        merit_new = merits[best]
        improved = merit_new < merit_prev - 1e-12

        x_new = jnp.where(improved, cand[best], x)
        lam_new = jnp.where(improved, jnp.maximum(lam * 0.5, 1e-8), lam * 10.0)
        merit_next = jnp.where(improved, merit_new, merit_prev)

        step_norm = jnp.linalg.norm(alphas[best] * d)
        conv = improved & (step_norm < 1e-7)

        x = jnp.where(done, x, x_new)
        lam = jnp.where(done, lam, lam_new)
        merit_prev = jnp.where(done, merit_prev, merit_next)
        used = used + jnp.where(done, 0, 1)
        done = done | conv | (lam > 1e8)
        return x, lam, merit_prev, done, used

    merit0, _, _ = _merit(x0, params, cfg, nu)
    merit0 = jnp.where(jnp.isfinite(merit0), merit0, jnp.inf)
    carry = (
        x0,
        jnp.asarray(1e-4, x0.dtype),
        merit0,
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
    )
    x, lam, merit_f, done, used = jax.lax.fori_loop(0, cfg.sqp_iters, body, carry)

    c = ocp.cost(x, params, cfg)
    g = ocp.constraints(x, params, cfg)
    viol = jnp.max(jnp.maximum(g, 0.0))
    # success criterion matches the reference's post-solve audit
    # (`BoundMPC.py:613-617`)
    success = viol < 1e-4
    return SQPResult(x=x, cost=c, viol=viol, iters=used, success=success)
