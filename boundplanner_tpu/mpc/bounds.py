"""Polynomial error-bound families (3rd/4th/6th order).

The reference carries hand-expanded closed-form coefficients for Hermite
style bound polynomials (`BoundMPC/mpc_utils_casadi.py:95-584`:
``compute_bound_params`` 4th order :223-320, ``compute_bound_params_six``
:323-481, ``compute_bound_params_three`` :484-542, evaluators :545-584).
They shape the orthogonal error corridor e(phi) between via points: value
and slope pinned at the segment ends with a prescribed maximum at the
midpoint.

Instead of transcribing hundreds of expanded monomial terms, each family
is solved as the tiny confluent-Vandermonde system its interpolation
conditions define — numerically identical (same conditions, same unique
polynomial), jittable, batchable with ``vmap``, and differentiable so the
corridor parameters can sit inside an outer optimization.

Interpolation conditions (verified against the reference closed forms):

- 4th order (phi0, phi1, e0, e1, s, e_max):
    p(phi0)=e0, p(phi1)=e1, p'(phi0)=s, p'(phi1)=-s, p(mid)=e_max
- 4th order general (s0, s1): p'(phi0)=s0, p'(phi1)=-s1
  (`compute_fourth_order_error_bound:95-220`)
- 6th order (phi0, phi1, e0, e1, s, em): flat C^2 ends —
    p(phi0)=e0, p'(phi0)=0, p''(phi0)=0,
    p(phi1)=e1, p'(phi1)=0, p''(phi1)=0, p(mid)=em
  (the slope argument is accepted but unused, matching the reference)
- 3rd order (phi0, phi1, e0, e1, de0, dde0):
    p(phi0)=e0, p(phi1)=e1, p'(phi0)=de0, p''(phi0)=dde0

All functions return coefficients highest-degree first, like the
reference tuples.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _derivative_row(t, degree: int, order: int):
    """Row of the confluent Vandermonde matrix: d^order/dt^order of
    [t^degree, ..., t, 1] evaluated at t."""
    powers = degree - jnp.arange(degree + 1)  # descending, matches output
    coef = jnp.array(
        [
            math.factorial(int(p)) / math.factorial(int(p) - order)
            if p >= order
            else 0.0
            for p in range(degree, -1, -1)
        ]
    )
    expnt = jnp.maximum(powers - order, 0)
    return coef * jnp.asarray(t) ** expnt


def _solve_conditions(degree: int, conditions):
    """conditions: list of (t, derivative_order, value). Returns the
    descending coefficient vector of the unique interpolant."""
    rows = jnp.stack([_derivative_row(t, degree, d) for t, d, _ in conditions])
    vals = jnp.stack([jnp.asarray(v, jnp.result_type(float)) for *_, v in conditions])
    return jnp.linalg.solve(rows, vals)


def compute_bound_params(phi0, phi1, e0, e1, s, e_max):
    """4th-order corridor: symmetric end slopes (ref
    `mpc_utils_casadi.py:223-320`). Returns (a4, a3, a2, a1, a0)."""
    mid = 0.5 * (phi0 + phi1)
    c = _solve_conditions(
        4,
        [(phi0, 0, e0), (phi1, 0, e1), (phi0, 1, s), (phi1, 1, -s), (mid, 0, e_max)],
    )
    return tuple(c)


def compute_bound_params_four(phi0, phi1, e0, e1, s0, s1, e_max):
    """4th-order corridor, independent end slopes (ref
    `mpc_utils_casadi.py:95-220` computes the value directly; this returns
    the coefficients for reuse). Returns (a4, a3, a2, a1, a0)."""
    mid = 0.5 * (phi0 + phi1)
    c = _solve_conditions(
        4,
        [(phi0, 0, e0), (phi1, 0, e1), (phi0, 1, s0), (phi1, 1, -s1), (mid, 0, e_max)],
    )
    return tuple(c)


def compute_bound_params_six(phi0, phi1, e0, e1, s, em):
    """6th-order corridor with flat C^2 ends (ref
    `mpc_utils_casadi.py:323-481`; the slope argument is unused there
    too). Returns (a6, ..., a0)."""
    del s  # parity: accepted but not a condition of the active family
    mid = 0.5 * (phi0 + phi1)
    c = _solve_conditions(
        6,
        [
            (phi0, 0, e0),
            (phi0, 1, 0.0),
            (phi0, 2, 0.0),
            (phi1, 0, e1),
            (phi1, 1, 0.0),
            (phi1, 2, 0.0),
            (mid, 0, em),
        ],
    )
    return tuple(c)


def compute_bound_params_three(phi0, phi1, e0, e1, de0, dde0):
    """3rd-order corridor pinned by initial value/slope/curvature (ref
    `mpc_utils_casadi.py:484-542`). Returns (a3, a2, a1, a0)."""
    c = _solve_conditions(
        3,
        [(phi0, 0, e0), (phi1, 0, e1), (phi0, 1, de0), (phi0, 2, dde0)],
    )
    return tuple(c)


def eval_bound_poly(phi, coeffs):
    """Evaluate a bound polynomial (descending coefficients) at phi —
    the role of the reference evaluators (`mpc_utils_casadi.py:545-584`).
    Horner form; works elementwise for array phi."""
    acc = jnp.zeros_like(jnp.asarray(phi)) + coeffs[0]
    for c in coeffs[1:]:
        acc = acc * phi + c
    return acc


def fourth_order_error_bound(phi, phi0, phi1, e0, e1, s0, s1, e_max):
    """Direct evaluation counterpart of the reference
    `compute_fourth_order_error_bound:95-220`."""
    return eval_bound_poly(
        phi, compute_bound_params_four(phi0, phi1, e0, e1, s0, s1, e_max)
    )


__all__ = [
    "compute_bound_params",
    "compute_bound_params_four",
    "compute_bound_params_six",
    "compute_bound_params_three",
    "eval_bound_poly",
    "fourth_order_error_bound",
]
