"""Pallas TPU kernel: batched Cholesky factorization + triangular inverse.

The KKT solves inside the QP IPM are the hot linear algebra of the engine
(~72% of the fused tick before the masked-loop rewrite). This kernel goes
one step further than `ops.linalg`: the whole (n, n, 128) working set
stays resident in VMEM across all 2n column/row steps, with the *batch*
in the 128-lane axis — zero HBM traffic between steps, pure VPU updates.

VMEM budget trick: the input batch stays in HBM (`pltpu.ANY`) and is
DMA'd into the single output buffer, where both the factorization and the
inversion run fully in place (X rows overwrite L rows that are no longer
needed: step j' of the inversion reads L row j' and X rows k < j', never
L rows < j').

Returns L^{-1}; a solve is then two MXU matvecs.

Integration status: INTEGRATED. `ops.linalg.kkt_inverse` routes the scene
vmap batch into this kernel wholesale through a
`jax.custom_batching.custom_vmap` rule (`ops/linalg.py`); non-TPU, f64,
and unbatched calls fall back to the masked column loop (bit-identical on
CPU). Enabled by `MPCParams.pallas_kkt` (on in `config.perf_mpc_params`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # mandated by Mosaic block-shape rules for the lane dim


def _row_blocks(n: int):
    """Split the row axis into up to 4 static blocks (multiples of 8 where
    possible) so each loop phase touches only the blocks it can change."""
    if n < 32:
        return ((0, n),)
    s = max(8, (n // 4) // 8 * 8)
    blocks = []
    start = 0
    while len(blocks) < 3 and start + s < n:
        blocks.append((start, s))
        start += s
    blocks.append((start, n - start))
    return tuple(blocks)


def _kernel(k_hbm_ref, out_hbm_ref, a_ref, sem, n: int):
    """One tile of LANES problems; a_ref (n, n, LANES) is the only VMEM
    buffer: K -> L (in place) -> L^{-1} (in place), then DMA'd out.

    Both sweeps run in phases over static row blocks: while column j is
    being eliminated, only rows > j change, and while inverse row j is
    being formed, only rows < j are read — so phase p of the
    factorization skips row blocks entirely below its column range and
    phase p of the inversion skips row blocks entirely above it
    (masked-zero contributions either way; skipping is exact). This cuts
    the VPU work of the full-matrix masked updates by ~37% and keeps
    every temporary at block size (VMEM budget)."""
    i = pl.program_id(0)
    tile = pl.ds(i * LANES, LANES)
    dma_in = pltpu.make_async_copy(k_hbm_ref.at[:, :, tile], a_ref, sem)
    dma_in.start()
    dma_in.wait()
    out_ref = a_ref  # factorization + inversion run in this one buffer

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    blocks = _row_blocks(n)
    row_ids_b = {
        h0: jax.lax.broadcasted_iota(jnp.int32, (hn, 1, 1), 0) + h0
        for h0, hn in blocks
    }

    def chol_step(j, _, upd_blocks):
        col = out_ref[:, pl.ds(j, 1), :]                    # (n, 1, L)
        onehot_c = (row_ids == j).astype(col.dtype)
        d = jnp.sqrt(
            jnp.maximum(jnp.sum(col * onehot_c, axis=0, keepdims=True), 1e-30)
        )
        colb = jnp.where(row_ids > j, col / d, 0.0)
        row = out_ref[pl.ds(j, 1), :, :]                    # (1, n, L)
        rowb = jnp.where(col_ids > j, row / d, 0.0)
        for (h0, hn) in upd_blocks:                         # trailing update
            blk = out_ref[pl.ds(h0, hn), :, :]
            out_ref[pl.ds(h0, hn), :, :] = blk - colb[h0 : h0 + hn] * rowb
        out_ref[:, pl.ds(j, 1), :] = colb + onehot_c * d    # store L column j
        return 0

    for p, (h0, hn) in enumerate(blocks):
        # columns j in [h0, h0+hn): rows <= h0 <= j never change
        jax.lax.fori_loop(
            h0, h0 + hn,
            functools.partial(chol_step, upd_blocks=blocks[p:]), 0,
        )

    def inv_step(j, _, read_blocks):
        row = out_ref[pl.ds(j, 1), :, :]                    # (1, n, L)
        onehot_r = (col_ids == j).astype(row.dtype)
        d = jnp.sum(row * onehot_r, axis=1, keepdims=True)  # (1, 1, L)
        lrow = jnp.where(col_ids < j, row, 0.0)             # L[j, :j]
        lrow_t = jnp.transpose(lrow, (1, 0, 2))             # (n, 1, L)
        # rows k < j of out_ref already hold X rows; rows >= j unused here
        s = 0.0
        for (h0, hn) in read_blocks:
            blk = out_ref[pl.ds(h0, hn), :, :]
            masked = jnp.where(row_ids_b[h0] < j, blk, 0.0)
            s = s + jnp.sum(lrow_t[h0 : h0 + hn] * masked, axis=0, keepdims=True)
        out_ref[pl.ds(j, 1), :, :] = (onehot_r - s) / d
        return 0

    for p, (h0, hn) in enumerate(blocks):
        # rows j in [h0, h0+hn): X rows live strictly below j
        jax.lax.fori_loop(
            h0, h0 + hn,
            functools.partial(inv_step, read_blocks=blocks[: p + 1]), 0,
        )

    dma_out = pltpu.make_async_copy(a_ref, out_hbm_ref.at[:, :, tile], sem)
    dma_out.start()
    dma_out.wait()


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
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n, n, btot), dtype),
        scratch_shapes=[
            pltpu.VMEM((n, n, LANES), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(k_t)
    return jnp.transpose(out_t, (2, 0, 1))[:bsz]
