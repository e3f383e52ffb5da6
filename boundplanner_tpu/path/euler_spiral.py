"""Euler-spiral (clothoid) corner blending between linear path segments.

Functional equivalent of `bound_planner/ReferencePath/euler_spiral.py`
(bit-rotted and unwired in the reference snapshot — SURVEY.md §2.4),
derived independently rather than transcribed:

A clothoid with curvature kappa(s) = 2*a*s has tangent angle
alpha(s) = a*s^2 and position given by the Fresnel-type integral

    F_a(s) = integral_0^s (cos(a t^2), sin(a t^2)) dt.

To blend a corner between unit directions ``u`` (incoming) and ``w``
(outgoing) with total turn ``theta``, run a clothoid of half-length L
whose curvature ramps 0 -> kappa_max (turning theta/2), then its mirror
image ramping back to 0 (turning the remaining theta/2). Choosing
``a = theta / (2 L^2)`` makes alpha(L) = theta/2. By the mirror symmetry
of the second half,

    p(s) = F_a(s)                                  for s in [0, L]
    p(s) = F_a(L) + R(theta) C (F_a(L) - F_a(2L-s)) for s in [L, 2L]

with R(theta) the 2-D rotation and C = diag(1, -1): substituting
t = 2L - s turns the second-half tangent (cos(theta - a t^2),
sin(theta - a t^2)) into R(theta) C (cos(a t^2), sin(a t^2)).

Placement is closed-form: with the blend start on the incoming line at
distance d before the corner, the exit point must lie on the outgoing
ray, i.e. p(2L) = (d, 0) + r (cos theta, sin theta) for some r >= 0.
Two equations, two unknowns:

    r = p_y(2L) / sin(theta),   d = p_x(2L) - r cos(theta).

(The reference reaches the same point via an explicit projection +
angle construction, `euler_spiral.py:45-58`.) F_a is evaluated with
fixed-order Gauss-Legendre quadrature — vectorized over arc samples and
accurate to ~1e-15 for the small turn angles of path corners, unlike a
truncated Taylor series.
"""

from __future__ import annotations

import numpy as np

_GL_NODES, _GL_WEIGHTS = np.polynomial.legendre.leggauss(24)


def eval_euler_spiral(a, s):
    """Clothoid position F_a(s); ``s`` may be a scalar or an array.

    Returns shape (..., 2): (integral cos(a t^2), integral sin(a t^2)).
    """
    s = np.asarray(s, float)
    t = 0.5 * s[..., None] * (_GL_NODES + 1.0)  # map [-1, 1] -> [0, s]
    ang = a * t * t
    half_w = 0.5 * s[..., None] * _GL_WEIGHTS
    return np.stack(
        [np.sum(half_w * np.cos(ang), -1), np.sum(half_w * np.sin(ang), -1)],
        axis=-1,
    )


def _rot2(angle):
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s], [s, c]])


def create_euler_spiral(v1, v2, length: float = 0.05):
    """Clothoid blend parameters for the corner v1 -> v2.

    Returns ``(a, b, theta, plane, offset, shortenings)``:
      a, b        : curvature slopes of the two halves (b = -a)
      theta       : full corner turn angle, in (0, pi)
      plane       : (2, 3) rows (u, u_perp) spanning the corner plane;
                    local 2-D coords map back via ``plane.T @ xy``
      offset      : blend start sits ``offset + length`` before the
                    corner along v1
      shortenings : arc-parameter corrections [d - L, r - L] for the
                    incoming / outgoing segments (d, r = corner
                    distances of the blend start / end)
    """
    u = np.asarray(v1, float)
    w = np.asarray(v2, float)
    u = u / np.linalg.norm(u)
    w = w / np.linalg.norm(w)

    if np.linalg.norm(u - w) < 1e-3:  # straight-through: nothing to blend
        return 0.0, 0.0, 0.0, np.vstack((u, w)), 0.0, [0.0, 0.0]

    # orthonormal corner-plane frame with u_perp on w's side, so the
    # local turn is always positive
    u_perp = w - (u @ w) * u
    u_perp = u_perp / np.linalg.norm(u_perp)
    plane = np.vstack((u, u_perp))
    theta = float(np.arctan2(u_perp @ w, u @ w))  # in (0, pi)

    a = theta / (2.0 * length**2)  # alpha(L) = a L^2 = theta / 2

    # full-blend exit point from the mirror identity at s = 2L
    p_mid = eval_euler_spiral(a, length)
    p_exit = p_mid + _rot2(theta) @ (p_mid * np.array([1.0, -1.0]))

    # closed-form placement on the corner's two rays
    r_out = p_exit[1] / np.sin(theta)
    d_in = p_exit[0] - r_out * np.cos(theta)

    return a, -a, theta, plane, d_in - length, [d_in - length, r_out - length]


def eval_blend(a, theta, plane, offset, length, s, corner, v1, v2):
    """Evaluate the blended 3-D path at arc parameter ``s`` in [0, 2L],
    measured from the blend start (``offset + length`` before the corner
    along v1). ``s`` may be a scalar or an array; returns (..., 3)."""
    u = np.asarray(v1, float)
    u = u / np.linalg.norm(u)
    start = np.asarray(corner, float) - (offset + length) * u

    s = np.asarray(s, float)
    first = eval_euler_spiral(a, np.minimum(s, length))
    p_mid = eval_euler_spiral(a, length)
    tail = p_mid - eval_euler_spiral(a, np.clip(2.0 * length - s, 0.0, length))
    mirror = _rot2(theta) * np.array([1.0, -1.0])  # R(theta) @ diag(1, -1)
    second = p_mid + tail @ mirror.T
    xy = np.where((s <= length)[..., None], first, second)
    return start + xy @ plane
