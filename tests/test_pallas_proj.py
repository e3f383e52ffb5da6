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


def test_seg_poly_closest_folds_nested_vmaps(rng):
    """The custom_vmap boundary must fold (scene, link, obstacle) axes into
    one problem batch; on CPU the base case is the exact IPM, so nested
    vmaps must agree with direct per-problem solves."""
    from boundplanner_tpu.ops.pallas_proj import seg_poly_closest

    a, b, p0, p1 = make_batch(rng, bsz=12)
    a = jnp.asarray(a.reshape(2, 3, 2, 15, 3))
    b = jnp.asarray(b.reshape(2, 3, 2, 15))
    p0 = jnp.asarray(p0.reshape(2, 3, 2, 3))
    p1 = jnp.asarray(p1.reshape(2, 3, 2, 3))

    x_n, phi_n = jax.vmap(jax.vmap(seg_poly_closest))(a, b, p0, p1)
    assert x_n.shape == (2, 3, 2, 3) and phi_n.shape == (2, 3, 2)

    x_f, phi_f = seg_poly_closest(
        a.reshape(-1, 15, 3), b.reshape(-1, 15), p0.reshape(-1, 3),
        p1.reshape(-1, 3),
    )
    np.testing.assert_allclose(np.asarray(x_n).reshape(-1, 3), np.asarray(x_f),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(phi_n).reshape(-1), np.asarray(phi_f),
                               atol=1e-12)


def test_seg_poly_closest_broadcasts_unbatched_operands(rng):
    """Outer vmap over scenes where the segment endpoints are shared
    (unbatched) must broadcast correctly in the fold rule."""
    from boundplanner_tpu.ops.pallas_proj import seg_poly_closest

    a, b, p0, p1 = make_batch(rng, bsz=8)
    a = jnp.asarray(a.reshape(2, 4, 15, 3))
    b = jnp.asarray(b.reshape(2, 4, 15))
    p0s = jnp.asarray(p0[:4])
    p1s = jnp.asarray(p1[:4])

    x_v, phi_v = jax.vmap(lambda aa, bb: seg_poly_closest(aa, bb, p0s, p1s))(a, b)
    for i in range(2):
        x_d, phi_d = seg_poly_closest(a[i], b[i], p0s, p1s)
        np.testing.assert_allclose(np.asarray(x_v[i]), np.asarray(x_d), atol=1e-12)
        np.testing.assert_allclose(np.asarray(phi_v[i]), np.asarray(phi_d), atol=1e-12)
