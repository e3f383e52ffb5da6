"""Closed-form jerk-spline joint integration.

The reference integrates piecewise-linear (triangle-basis) jerk through the
spline evaluators of `bound_planner/BoundMPC/jerk_trajectory_casadi.py`
(calcAngle/calcVelocity/calcAcceleration at t = dt). At t = dt only the
first two jerk columns contribute, giving the closed forms below — the
same discrete dynamics the OCP uses (`casadi_ocp_formulation.py:106-120`),
so simulator and optimizer agree exactly.
"""

from __future__ import annotations

import jax.numpy as jnp


def integrate_jerk_step(q, dq, ddq, u0, u1, dt):
    """One dt of the jerk-spline chain (ref `util_functions.py:53-63` +
    `jerk_trajectory_casadi.py` at t=dt)."""
    q_n = q + dt * dq + dt**2 / 2.0 * ddq + dt**3 / 8.0 * u0 + dt**3 / 24.0 * u1
    dq_n = dq + dt * ddq + dt**2 / 3.0 * u0 + dt**2 / 6.0 * u1
    ddq_n = ddq + dt / 2.0 * (u0 + u1)
    return q_n, dq_n, ddq_n
