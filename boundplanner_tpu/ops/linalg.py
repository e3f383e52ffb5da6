"""Batch-friendly dense linear algebra for TPU.

XLA lowers ``cho_factor``/``cho_solve`` to LAPACK-style custom-calls that
serialize badly for *batched small* matrices on TPU — profiling the fused
MPC tick showed ~72% of runtime inside those custom-calls. These
replacements express the factorization as a fixed-trip column loop of
masked vector/outer-product updates: under ``vmap`` every step becomes a
(batch, n)/(batch, n, n) fused element-wise op on the VPU, which is the
layout TPUs like. Numerically standard right-looking Cholesky.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky_masked(a):
    """Lower-triangular Cholesky factor of SPD ``a`` (n, n), column-loop
    form. vmap-friendly; no custom-calls."""
    n = a.shape[0]
    idx = jnp.arange(n)

    def body(j, aa):
        d = jnp.sqrt(jnp.maximum(aa[j, j], 1e-30))
        col_below = jnp.where(idx > j, aa[:, j] / d, 0.0)
        aa = aa - jnp.outer(col_below, col_below)
        new_col = col_below.at[j].set(d)
        aa = aa.at[:, j].set(jnp.where(idx >= j, new_col, aa[:, j]))
        return aa

    l = jax.lax.fori_loop(0, n, body, a)
    return jnp.tril(l)


def solve_lower(l, b):
    """Solve L y = b with L lower-triangular, forward substitution as a
    fixed-trip loop of masked dot products."""
    n = b.shape[0]
    idx = jnp.arange(n)

    def body(j, y):
        mask = (idx < j).astype(b.dtype)
        s = jnp.dot(l[j] * mask, y)
        return y.at[j].set((b[j] - s) / l[j, j])

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(b))


def solve_upper_t(l, b):
    """Solve L^T x = b (back substitution over the lower factor)."""
    n = b.shape[0]
    idx = jnp.arange(n)

    def body(k, x):
        j = n - 1 - k
        mask = (idx > j).astype(b.dtype)
        s = jnp.dot(l[:, j] * mask, x)
        return x.at[j].set((b[j] - s) / l[j, j])

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(b))


def invert_lower(l):
    """Explicit inverse of a lower-triangular matrix, row-loop form.

    Each of the n steps is a masked (n,)x(n,n) matvec — n sequential steps
    total (vs n per *solve*), after which every solve with this factor is
    two MXU matvecs. Worth it whenever the factor is reused (the IPM does
    4 triangular solves per factorization)."""
    n = l.shape[0]
    idx = jnp.arange(n)
    eye = jnp.eye(n, dtype=l.dtype)

    def body(j, x):
        mask = (idx < j).astype(l.dtype)
        row = (eye[j] - (l[j] * mask) @ x) / l[j, j]
        return x.at[j].set(row)

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(l))


def chol_solve(l, b):
    """Solve (L L^T) x = b given the factor."""
    return solve_upper_t(l, solve_lower(l, b))


def spd_solve(a, b):
    """Solve SPD system a x = b via the masked Cholesky."""
    return chol_solve(cholesky_masked(a), b)


def _factor_panel(a_panel, k, nb, n):
    """Factor columns [k, k+nb) over rows [k, n) of the panel (n-k, nb),
    column loop with masked updates; returns the factored panel."""
    rows = jnp.arange(a_panel.shape[0])

    def body(jj, p):
        d = jnp.sqrt(jnp.maximum(p[jj, jj], 1e-30))
        col = jnp.where(rows > jj, p[:, jj] / d, 0.0)
        p = p - jnp.outer(col, jnp.where(jnp.arange(nb) > jj, p[jj, :] / d, 0.0))
        new_col = col.at[jj].set(d)
        p = p.at[:, jj].set(jnp.where(rows >= jj, new_col, p[:, jj]))
        return p

    return jax.lax.fori_loop(0, nb, body, a_panel)


def blocked_cholesky(a, nb: int = 34):
    """Blocked right-looking Cholesky (pure JAX, static block loop).

    The trailing update per block is one matmul (MXU) instead of nb
    rank-1 streams — ~nb x less HBM traffic than the column loop for the
    dominant part. n must be divisible by nb."""
    n = a.shape[0]
    assert n % nb == 0, (n, nb)
    for k in range(0, n, nb):
        panel = _factor_panel(a[k:, k : k + nb], k, nb, n)
        a = a.at[k:, k : k + nb].set(panel)
        if k + nb < n:
            l21 = panel[nb:, :]  # (n-k-nb, nb)
            a = a.at[k + nb :, k + nb :].add(-(l21 @ l21.T))
    return jnp.tril(a)


def blocked_invert_lower(l, nb: int = 34):
    """Blocked lower-triangular inversion: X = L^{-1}.

    Uses X_kk = inv(L_kk) (small row loop) and
    X_ik = -inv(L_ii) L_i,k..i X_k..i,k accumulated blockwise (matmuls)."""
    n = l.shape[0]
    assert n % nb == 0
    nblk = n // nb
    # invert diagonal blocks with the row loop
    diag_inv = []
    for i in range(nblk):
        diag_inv.append(invert_lower(l[i * nb : (i + 1) * nb, i * nb : (i + 1) * nb]))
    x = jnp.zeros_like(l)
    for i in range(nblk):
        x = x.at[i * nb : (i + 1) * nb, i * nb : (i + 1) * nb].set(diag_inv[i])
    # off-diagonal blocks, column of blocks k, rows i > k
    for k in range(nblk):
        for i in range(k + 1, nblk):
            acc = jnp.zeros((nb, nb), l.dtype)
            for j in range(k, i):
                acc = acc + l[i * nb : (i + 1) * nb, j * nb : (j + 1) * nb] @ x[
                    j * nb : (j + 1) * nb, k * nb : (k + 1) * nb
                ]
            x = x.at[i * nb : (i + 1) * nb, k * nb : (k + 1) * nb].set(
                -diag_inv[i] @ acc
            )
    return x


def _kkt_inverse_ref(kkt):
    """Unbatched reference path: column-loop Cholesky + inversion."""
    return invert_lower(cholesky_masked(kkt))


@jax.custom_batching.custom_vmap
def kkt_inverse(kkt):
    """L^{-1} of an SPD KKT matrix, with a batching rule that routes whole
    vmapped batches to the Pallas lane-batched kernel on TPU.

    Under the scene-vmap of the fused MPC tick this turns the per-scene
    column loops into one all-VMEM kernel over the batch (measured 1.7x on
    the factorization+inversion itself). On non-TPU backends (or when the
    matrix shape doesn't fit the kernel's tiling rules) the rule falls
    back to the vmapped column loop.
    """
    return _kkt_inverse_ref(kkt)


@kkt_inverse.def_vmap
def _kkt_inverse_vmap_rule(axis_size, in_batched, kkt):
    (k_batched,) = in_batched
    if not k_batched:
        return _kkt_inverse_ref(kkt), False
    n = kkt.shape[-1]
    backend = jax.default_backend()
    use_pallas = (
        backend in ("tpu", "axon")
        and kkt.dtype == jnp.float32
        and n % 8 == 0
        and n >= 64
    )
    if use_pallas:
        from .pallas_chol import cholesky_inverse

        # interleave=True: chol_step(j) + inv_step(j) fused into one
        # n-step loop — bit-identical output (interpret-mode equivalence
        # test in tests/test_pallas_chol.py), ~1.3% faster kernel-level
        # (tools/bench_chol.py, ROUND4_NOTES).
        return cholesky_inverse(kkt, interleave=True), True
    return jax.vmap(_kkt_inverse_ref)(kkt), True
