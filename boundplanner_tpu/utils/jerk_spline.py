"""Triangle-basis (piecewise-linear) jerk spline evaluation.

Full re-derivation of `bound_planner/BoundMPC/jerk_trajectory_casadi.py`
as JAX: a jerk trajectory given by samples ``u_j`` at knots ``t_j = j h``
is interpolated linearly (the reference's triangle/hat basis,
`jerk_trajectory_casadi.py:6-43`); acceleration, velocity and position
follow by exact integration.

Instead of the reference's per-basis piecewise closed forms with python
``if`` chains (`:46-175`), we scan over knot intervals: within interval j
the jerk is affine (u_j + du_j s), so the chain of antiderivatives is a
quartic evaluated at tau_j = clip(t - t_j, 0, h). Branch-free, jittable,
``vmap`` over query times and joint dimensions.

``integrate_jerk_step`` in `utils.integration` is the t = h special case
used by the control loop; these evaluators serve arbitrary-time resampling
and telemetry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def eval_spline(u, h, t, q0=0.0, v0=0.0, a0=0.0):
    """Evaluate (jerk, acc, vel, pos) at time ``t``.

    u: (M,) or (M, D) jerk knot values; h: knot spacing; t: scalar time.
    Initial conditions q0/v0/a0 broadcast against the trailing dims of u.
    """
    u = jnp.asarray(u)
    m = u.shape[0]
    taus = jnp.clip(t - jnp.arange(m - 1) * h, 0.0, h)  # (M-1,)
    u0s = u[:-1]
    dus = (u[1:] - u[:-1]) / h

    def body(carry, inp):
        q, v, a = carry
        tau, u0, du = inp
        q = q + v * tau + a * tau**2 / 2.0 + u0 * tau**3 / 6.0 + du * tau**4 / 24.0
        v = v + a * tau + u0 * tau**2 / 2.0 + du * tau**3 / 6.0
        a = a + u0 * tau + du * tau**2 / 2.0
        return (q, v, a), None

    zero = jnp.zeros(u.shape[1:], u.dtype)
    init = (q0 + zero, v0 + zero, a0 + zero)
    (q, v, a), _ = jax.lax.scan(body, init, (taus, u0s, dus))

    idx = jnp.clip(jnp.floor(t / h).astype(jnp.int32), 0, m - 2)
    tau_j = jnp.clip(t - idx * h, 0.0, h)
    jerk = u[idx] + (u[idx + 1] - u[idx]) / h * tau_j
    return jerk, a, v, q


def eval_jerk(u, h, t):
    return eval_spline(u, h, t)[0]


def eval_acceleration(u, h, a0, t):
    return eval_spline(u, h, t, a0=a0)[1]


def eval_velocity(u, h, v0, a0, t):
    return eval_spline(u, h, t, v0=v0, a0=a0)[2]


def eval_position(u, h, q0, v0, a0, t):
    return eval_spline(u, h, t, q0=q0, v0=v0, a0=a0)[3]
