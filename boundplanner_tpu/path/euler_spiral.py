"""Euler-spiral (clothoid) corner blending between linear path segments.

Working re-implementation of `bound_planner/ReferencePath/euler_spiral.py`
(which is bit-rotted in the reference snapshot: it imports a stale package
name, `euler_spiral.py:7`, and its outputs are never consumed on the live
branch — SURVEY.md §2.4). Provided as a functional component: a clothoid
pair whose curvature ramps linearly up then down blends the kink between
two unit directions v1 -> v2, C1-continuously.

Math: in the 2-D plane spanned by (v1, v2), a clothoid with curvature
kappa(s) = 2 a s turns by theta(s) = a s^2; choosing a = theta_total /
(2 L^2) over a half-length L and mirroring gives total turn theta_total
with curvature continuous at the midpoint. The Fresnel integrals are
evaluated by their power series (`eval_euler_spiral`, matching the
reference series `euler_spiral.py:68-82`).
"""

from __future__ import annotations

import math

import numpy as np


def _gram_schmidt(v, b):
    return b - np.dot(v, b) * v


def signed_angle(v1, v2):
    """(ref `euler_spiral.py:10-13`)."""
    return np.arctan2(v1[1], v1[0]) - np.arctan2(v2[1], v2[0])


def eval_euler_spiral(a, phi, terms: int = 10):
    """Fresnel-series evaluation of the clothoid point at arc length phi
    (ref `euler_spiral.py:68-82`)."""
    int_cos = 0.0
    int_sin = 0.0
    for n in range(terms):
        int_sin += (
            (-1) ** n
            * (a ** (2 * n + 1) * phi ** (4 * n + 3))
            / (math.factorial(2 * n + 1) * (4 * n + 3))
        )
        int_cos += (a ** (2 * n) * (-(phi**4)) ** n) / (
            math.factorial(2 * n) * (1 + 4 * n)
        )
    int_cos *= phi
    return np.array([int_cos, int_sin])


def create_euler_spiral(v1, v2, length: float = 0.05):
    """Clothoid blend parameters for the corner v1 -> v2
    (ref `create_euler_sprial`, `euler_spiral.py:16-65`).

    Returns (a, b, theta, rot_2d, offset, shortenings):
      a, b      : curvature slopes of the two clothoid halves (b = -a)
      theta     : half turn angle
      rot_2d    : 2x3 projection onto the corner plane (rows: v1, v1-orth)
      offset    : backset of the blend start along v1
      shortenings : path-parameter corrections for the two adjacent segments
    """
    v1 = np.asarray(v1, float).copy()
    v2 = np.asarray(v2, float).copy()
    v1 /= np.linalg.norm(v1)
    v2 /= np.linalg.norm(v2)
    phi_b = 2.0 * length

    if np.linalg.norm(v1 - v2) < 1e-3:
        rot_2d = np.vstack((v1, v2))
        return 0.0, 0.0, 0.0, rot_2d, 0.0, [0.0, 0.0]

    v2_orth = _gram_schmidt(v1, v2)
    v2_orth /= np.linalg.norm(v2_orth)
    rot_2d = np.vstack((v1, v2_orth))

    dl1 = rot_2d @ v1
    dl2 = rot_2d @ v2

    theta = -signed_angle(dl1, dl2)
    a = (2.0 * theta) / (phi_b**2)
    b = -a

    # mirror the first half to obtain the end point of the full blend
    p_via = length * dl1
    p_mid = eval_euler_spiral(a, length)
    angle = theta + 2.0 * signed_angle(np.array([1.0, 0.0]), p_mid)
    rot_mat = np.array(
        [[np.cos(angle), -np.sin(angle)], [np.sin(angle), np.cos(angle)]]
    )
    p_end = p_mid + rot_mat @ p_mid

    # shift so the blend exits exactly on the outgoing linear segment
    v_via_end = p_end - p_via
    p_proj = p_via + np.dot(v_via_end, dl2) * dl2
    angle_proj = np.pi - signed_angle(np.array([1.0, 0.0]), p_proj - p_end)
    offset = np.linalg.norm(p_proj - p_end) / np.cos(angle_proj)

    p_start = -dl1 * offset
    p_end = p_end + p_start
    lin_length1 = np.linalg.norm(p_start - p_via)
    lin_length2 = np.linalg.norm(p_end - p_via)
    shortenings = [lin_length1 - length, lin_length2 - length]

    return a, b, theta, rot_2d, offset, shortenings


def eval_blend(a, theta, rot_2d, offset, length, s, corner, v1, v2):
    """Evaluate the blended 3-D path at arc parameter s in [0, 2*length]
    measured from the blend start (placed ``offset + length`` before the
    corner along v1). First half: clothoid with slope a; second half:
    mirrored clothoid turning onto v2."""
    v1 = np.asarray(v1, float) / np.linalg.norm(v1)
    start = corner - (offset + length) * v1
    basis = rot_2d  # rows map 2-D coords back through rot_2d.T
    if s <= length:
        p2 = eval_euler_spiral(a, s)
    else:
        # second half: curvature ramps down; tangent angle
        # alpha(s) = theta - a (2L - s)^2, giving
        # p(s) = p_mid + R(theta) C (F(L) - F(2L - s)), C = diag(1, -1)
        p_mid = eval_euler_spiral(a, length)
        rot_t = np.array(
            [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
        )
        conj = np.diag([1.0, -1.0])
        p2 = p_mid + rot_t @ conj @ (p_mid - eval_euler_spiral(a, 2 * length - s))
    return start + basis.T @ p2
