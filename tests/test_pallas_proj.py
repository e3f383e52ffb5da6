"""Pallas line-polytope projection kernel vs the exact IPM solution.

Runs in interpreter mode on CPU (the compiled path is exercised on real
TPU by bench/entry)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from boundplanner_tpu.ops.pallas_proj import line_polytope_projection
from boundplanner_tpu.ops.qp import solve_line_projection


def make_batch(rng, bsz=24, r_rows=15):
    a = np.zeros((bsz, r_rows, 3))
    b = 10.0 * np.ones((bsz, r_rows))
    p0 = np.zeros((bsz, 3))
    p1 = np.zeros((bsz, 3))
    for i in range(bsz):
        center = rng.uniform(-0.5, 0.5, 3)
        half = rng.uniform(0.1, 0.3, 3)
        eye = np.eye(3)
        a[i, :6] = np.vstack([eye, -eye])
        b[i, :6] = np.concatenate([center + half, -(center - half)])
        # random segment outside-ish
        p0[i] = center + rng.uniform(0.5, 1.0, 3) * rng.choice([-1, 1], 3)
        p1[i] = p0[i] + rng.uniform(-0.5, 0.5, 3)
    return a, b, p0, p1


def test_matches_ipm(rng):
    a, b, p0, p1 = make_batch(rng)
    x, phi, dist = line_polytope_projection(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(p0), jnp.asarray(p1),
        interpret=True,
    )
    x = np.asarray(x)
    dist = np.asarray(dist)
    for i in range(a.shape[0]):
        x_ref, phi_ref, _ = solve_line_projection(
            jnp.asarray(a[i]), jnp.asarray(b[i]), jnp.asarray(p0[i]), jnp.asarray(p1[i])
        )
        seg_ref = p0[i] + float(phi_ref) * (p1[i] - p0[i])
        dist_ref = np.linalg.norm(np.asarray(x_ref) - seg_ref)
        # distances agree tightly; points agree to kernel tolerance
        np.testing.assert_allclose(dist[i], dist_ref, atol=2e-3)
        assert np.max(a[i] @ x[i] - b[i]) < 1e-4  # feasible


def test_inside_segment():
    """Segment intersecting the polytope -> distance ~ 0."""
    eye = np.eye(3)
    a = np.vstack([eye, -eye])[None]
    b = np.ones((1, 6)) * 0.5
    p0 = np.array([[-1.0, 0.0, 0.0]])
    p1 = np.array([[1.0, 0.0, 0.0]])
    x, phi, dist = line_polytope_projection(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(p0), jnp.asarray(p1),
        interpret=True,
    )
    assert float(dist[0]) < 1e-4
