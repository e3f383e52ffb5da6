"""Masked-loop Cholesky vs numpy/scipy reference."""

import numpy as np

import jax
import jax.numpy as jnp

from boundplanner_tpu.ops.linalg import cholesky_masked, chol_solve, spd_solve


def random_spd(rng, n):
    a = rng.normal(size=(n, n))
    return a @ a.T + n * np.eye(n)


def test_cholesky_matches_numpy(rng):
    for n in (4, 17, 136):
        a = random_spd(rng, n)
        l = np.asarray(cholesky_masked(jnp.asarray(a)))
        l_ref = np.linalg.cholesky(a)
        np.testing.assert_allclose(l, l_ref, atol=1e-8 * n)


def test_solve(rng):
    for n in (4, 50):
        a = random_spd(rng, n)
        b = rng.normal(size=n)
        x = np.asarray(spd_solve(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(a @ x, b, atol=1e-8)


def test_vmap(rng):
    n, bsz = 24, 8
    a = np.stack([random_spd(rng, n) for _ in range(bsz)])
    b = rng.normal(size=(bsz, n))
    x = np.asarray(jax.vmap(spd_solve)(jnp.asarray(a), jnp.asarray(b)))
    for i in range(bsz):
        np.testing.assert_allclose(a[i] @ x[i], b[i], atol=1e-8)


def test_invert_lower(rng):
    from boundplanner_tpu.ops.linalg import invert_lower
    for n in (5, 40):
        a = random_spd(rng, n)
        l = np.linalg.cholesky(a)
        li = np.asarray(invert_lower(jnp.asarray(l)))
        np.testing.assert_allclose(li @ l, np.eye(n), atol=1e-9)


def test_blocked_cholesky(rng):
    from boundplanner_tpu.ops.linalg import blocked_cholesky
    n = 136
    a = random_spd(rng, n)
    l = np.asarray(blocked_cholesky(jnp.asarray(a), nb=34))
    np.testing.assert_allclose(l, np.linalg.cholesky(a), atol=1e-7 * n)


def test_blocked_invert(rng):
    from boundplanner_tpu.ops.linalg import blocked_cholesky, blocked_invert_lower
    n = 136
    a = random_spd(rng, n)
    l = blocked_cholesky(jnp.asarray(a), nb=34)
    li = np.asarray(blocked_invert_lower(l, nb=34))
    np.testing.assert_allclose(li @ np.asarray(l), np.eye(n), atol=1e-8)


def test_blocked_vmap(rng):
    from boundplanner_tpu.ops.linalg import blocked_cholesky
    a = np.stack([random_spd(rng, 68) for _ in range(4)])
    ls = np.asarray(jax.vmap(lambda m: blocked_cholesky(m, nb=34))(jnp.asarray(a)))
    for i in range(4):
        np.testing.assert_allclose(ls[i], np.linalg.cholesky(a[i]), atol=1e-6)


def test_kkt_inverse_custom_vmap(rng):
    """The custom_vmap-routed KKT inverse must match the column loop in
    every calling pattern (unbatched, vmapped; the Pallas path itself is
    TPU-only and exercised by bench/entry)."""
    from boundplanner_tpu.ops.linalg import kkt_inverse, invert_lower, cholesky_masked

    ks = np.stack([random_spd(rng, 24) for _ in range(5)])
    ref = np.asarray(jax.vmap(lambda k: invert_lower(cholesky_masked(k)))(jnp.asarray(ks)))
    out_b = np.asarray(jax.jit(jax.vmap(kkt_inverse))(jnp.asarray(ks)))
    np.testing.assert_allclose(out_b, ref, atol=1e-12)
    out_1 = np.asarray(kkt_inverse(jnp.asarray(ks[0])))
    np.testing.assert_allclose(out_1, ref[0], atol=1e-12)


def test_solve_qp_pallas_flag_equivalence(rng):
    from boundplanner_tpu.ops.qp import solve_qp

    n, m = 8, 16
    a = rng.normal(size=(n, n))
    p = a @ a.T + np.eye(n)
    q = rng.normal(size=n)
    g = rng.normal(size=(m, n))
    h = g @ (0.1 * rng.normal(size=n)) + rng.uniform(0.1, 1, m)
    args = [jnp.asarray(np.stack([v] * 3)) for v in (p, q, g, h)]
    x_off = np.asarray(jax.vmap(lambda *a: solve_qp(*a, pallas_kkt=False).x)(*args))
    x_on = np.asarray(jax.vmap(lambda *a: solve_qp(*a, pallas_kkt=True).x)(*args))
    np.testing.assert_allclose(x_on, x_off, atol=1e-12)
