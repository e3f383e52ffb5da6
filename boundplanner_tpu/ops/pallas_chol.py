"""Pallas TPU kernel: batched Cholesky factorization + triangular inverse.

The KKT solves inside the QP IPM are the hot linear algebra of the engine
(~72% of the fused tick before the masked-loop rewrite). This kernel goes
one step further than `ops.linalg`: the whole (n, n, LANES) working set
stays resident in VMEM across all 2n column/row steps, with the *batch*
in the 128-lane axis — zero HBM traffic between steps, pure VPU updates.

Returns L^{-1} directly (the IPM then solves via two MXU matvecs).

Integration status: validated building block (like `pallas_proj`); wiring
it under the scene-vmap of the fused tick requires the explicit-batch QP
refactor (ROUND2_NOTES.md #1) because the kernel already consumes the
batch axis as lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 32  # VMEM budget: 3 buffers x (n, n, LANES) f32 with n ~ 136


def _kernel(k_ref, out_ref, a_ref, n: int):
    """One tile of LANES problems. k_ref/out_ref/a_ref: (n, n, LANES)."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)

    a_ref[:] = k_ref[:]

    def chol_step(j, _):
        col = a_ref[:, pl.ds(j, 1), :]                      # (n, 1, L)
        onehot_c = (row_ids == j).astype(col.dtype)         # (n, 1, 1)
        d = jnp.sqrt(
            jnp.maximum(jnp.sum(col * onehot_c, axis=0, keepdims=True), 1e-30)
        )                                                    # (1, 1, L)
        colb = jnp.where(row_ids > j, col / d, 0.0)
        row = a_ref[pl.ds(j, 1), :, :]                      # (1, n, L)
        rowb = jnp.where(col_ids > j, row / d, 0.0)
        # trailing (symmetric) rank-1 update, entirely in VMEM
        a_ref[:] = a_ref[:] - colb * rowb
        # store L's column j (diag d, below-diagonal colb)
        a_ref[:, pl.ds(j, 1), :] = colb + onehot_c * d
        return 0

    jax.lax.fori_loop(0, n, chol_step, 0)

    out_ref[:] = jnp.zeros_like(out_ref)

    def inv_step(j, _):
        row = a_ref[pl.ds(j, 1), :, :]                      # (1, n, L) row of L
        onehot_r = (col_ids == j).astype(row.dtype)         # (1, n, 1)
        d = jnp.sum(row * onehot_r, axis=1, keepdims=True)  # (1, 1, L)
        lrow = jnp.where(col_ids < j, row, 0.0)             # strict lower part
        lrow_t = jnp.transpose(lrow, (1, 0, 2))             # (n, 1, L)
        s = jnp.sum(lrow_t * out_ref[:], axis=0, keepdims=True)  # (1, n, L)
        out_ref[pl.ds(j, 1), :, :] = (onehot_r - s) / d
        return 0

    jax.lax.fori_loop(0, n, inv_step, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_inverse(k_batch, interpret: bool = False):
    """L^{-1} for a batch of SPD matrices. k_batch: (B, n, n) -> (B, n, n).

    n must be a multiple of 8 (f32 sublane tiling); B is padded to LANES
    internally.
    """
    bsz, n, _ = k_batch.shape
    dtype = k_batch.dtype
    pad = (-bsz) % LANES
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (pad, n, n))
        k_batch = jnp.concatenate([k_batch, eye], axis=0)
    btot = bsz + pad

    k_t = jnp.transpose(k_batch, (1, 2, 0))  # (n, n, B)
    grid = (btot // LANES,)
    kernel = functools.partial(_kernel, n=n)
    out_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n, btot), dtype),
        scratch_shapes=[pltpu.VMEM((n, n, LANES), dtype)],
        interpret=interpret,
    )(k_t)
    return jnp.transpose(out_t, (2, 0, 1))[:bsz]
