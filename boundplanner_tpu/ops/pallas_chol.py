"""Pallas TPU kernel: batched Cholesky factorization + triangular inverse.

The KKT solves inside the QP IPM are the hot linear algebra of the engine
(~72% of the fused tick before the masked-loop rewrite). This kernel goes
one step further than `ops.linalg`: the whole (n, n, 128) working set
stays resident in VMEM across all 2n column/row steps, with the *batch*
in the 128-lane axis — zero HBM traffic between steps, pure VPU updates.

VMEM budget trick: the input batch stays in HBM (`pl.ANY`) and is
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


def _kernel(k_hbm_ref, out_hbm_ref, a_ref, sem, n: int, two_d: bool):
    """One tile of LANES problems; a_ref (n, n, LANES) is the only VMEM
    buffer: K -> L (in place) -> L^{-1} (in place), then DMA'd out.

    Both sweeps run in phases over static row blocks: while column j is
    being eliminated, only rows > j change, and while inverse row j is
    being formed, only rows < j are read — so phase p of the
    factorization skips row blocks entirely below its column range and
    phase p of the inversion skips row blocks entirely above it
    (masked-zero contributions either way; skipping is exact). This cuts
    the VPU work of the full-matrix masked updates by ~37% and keeps
    every temporary at block size (VMEM budget).

    ``two_d`` additionally restricts the COLUMN range of the trailing
    updates / inverse products to the exact triangular support (a further
    ~33% work cut at the cost of (4-p)^2 instead of (4-p) Mosaic ops per
    step — A/B-gated on wall clock, as per-op overheads can dominate at
    these block sizes). The skipped upper-triangle blocks are zeroed once
    at the end so the returned L^{-1} is exactly lower-triangular."""
    i = pl.program_id(0)
    tile = pl.ds(i * LANES, LANES)
    dma_in = pltpu.make_async_copy(k_hbm_ref.at[:, :, tile], a_ref, sem)
    dma_in.start()
    dma_in.wait()
    out_ref = a_ref  # factorization + inversion run in this one buffer
    dtype = a_ref.dtype

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    blocks = _row_blocks(n)
    row_ids_b = {
        h0: jax.lax.broadcasted_iota(jnp.int32, (hn, 1, 1), 0) + h0
        for h0, hn in blocks
    }

    def chol_step(j, _, upd_blocks, col_blocks):
        col = out_ref[:, pl.ds(j, 1), :]                    # (n, 1, L)
        onehot_c = (row_ids == j).astype(col.dtype)
        d = jnp.sqrt(
            jnp.maximum(jnp.sum(col * onehot_c, axis=0, keepdims=True), 1e-30)
        )
        colb = jnp.where(row_ids > j, col / d, 0.0)
        row = out_ref[pl.ds(j, 1), :, :]                    # (1, n, L)
        rowb = jnp.where(col_ids > j, row / d, 0.0)
        for (h0, hn) in upd_blocks:                         # trailing update
            if col_blocks is None:
                blk = out_ref[pl.ds(h0, hn), :, :]
                out_ref[pl.ds(h0, hn), :, :] = blk - colb[h0 : h0 + hn] * rowb
            else:
                for (c0, cn) in col_blocks:
                    blk = out_ref[pl.ds(h0, hn), pl.ds(c0, cn), :]
                    out_ref[pl.ds(h0, hn), pl.ds(c0, cn), :] = (
                        blk - colb[h0 : h0 + hn] * rowb[:, c0 : c0 + cn]
                    )
        out_ref[:, pl.ds(j, 1), :] = colb + onehot_c * d    # store L column j
        return 0

    for p, (h0, hn) in enumerate(blocks):
        # columns j in [h0, h0+hn): rows <= h0 <= j never change; with
        # two_d, columns <= h0 <= j never change either
        jax.lax.fori_loop(
            h0, h0 + hn,
            functools.partial(
                chol_step,
                upd_blocks=blocks[p:],
                col_blocks=blocks[p:] if two_d else None,
            ),
            0,
        )

    def inv_step(j, _, read_blocks, col_blocks):
        row = out_ref[pl.ds(j, 1), :, :]                    # (1, n, L)
        onehot_r = (col_ids == j).astype(row.dtype)
        d = jnp.sum(row * onehot_r, axis=1, keepdims=True)  # (1, 1, L)
        lrow = jnp.where(col_ids < j, row, 0.0)             # L[j, :j]
        lrow_t = jnp.transpose(lrow, (1, 0, 2))             # (n, 1, L)
        # rows k < j of out_ref already hold X rows; rows >= j unused here
        if col_blocks is None:
            s = 0.0
            for (h0, hn) in read_blocks:
                blk = out_ref[pl.ds(h0, hn), :, :]
                masked = jnp.where(row_ids_b[h0] < j, blk, 0.0)
                s = s + jnp.sum(
                    lrow_t[h0 : h0 + hn] * masked, axis=0, keepdims=True
                )
            out_ref[pl.ds(j, 1), :, :] = (onehot_r - s) / d
        else:
            # X rows k < j are zero beyond column k, so column blocks
            # above the current phase contribute exactly zero
            for (c0, cn) in col_blocks:
                s = 0.0
                for (h0, hn) in read_blocks:
                    blk = out_ref[pl.ds(h0, hn), pl.ds(c0, cn), :]
                    masked = jnp.where(row_ids_b[h0] < j, blk, 0.0)
                    s = s + jnp.sum(
                        lrow_t[h0 : h0 + hn] * masked, axis=0, keepdims=True
                    )
                out_ref[pl.ds(j, 1), pl.ds(c0, cn), :] = (
                    (onehot_r[:, c0 : c0 + cn] - s) / d
                )
        return 0

    for p, (h0, hn) in enumerate(blocks):
        # rows j in [h0, h0+hn): X rows live strictly below j
        jax.lax.fori_loop(
            h0, h0 + hn,
            functools.partial(
                inv_step,
                read_blocks=blocks[: p + 1],
                col_blocks=blocks[: p + 1] if two_d else None,
            ),
            0,
        )

    if two_d:
        # zero the never-written strictly-upper blocks so the result is
        # exactly lower-triangular (matching the full-width path)
        for p, (h0, hn) in enumerate(blocks):
            for (c0, cn) in blocks[p + 1 :]:
                out_ref[pl.ds(h0, hn), pl.ds(c0, cn), :] = jnp.zeros(
                    (hn, cn, LANES), dtype
                )

    dma_out = pltpu.make_async_copy(a_ref, out_hbm_ref.at[:, :, tile], sem)
    dma_out.start()
    dma_out.wait()


def _kernel_il(k_hbm_ref, out_hbm_ref, a_ref, sem, n: int):
    """Interleaved variant of `_kernel`: ONE sequential loop of n steps
    runs chol_step(j) AND inv_step(j) per iteration (vs n + n steps).

    Why: the sweeps are bound by the sequential per-step issue latency,
    not by data volume or arithmetic — measured via the two_d experiment
    (restricting update width removed 33% of touched data for 3.6% of
    time) and the rank-2 experiment (halving steps by serializing two
    pivots per step LOST — the second pivot extends the critical chain).
    Interleaving halves the step count with genuinely INDEPENDENT work
    per step: the factorization's trailing update touches rows > j while
    the inversion's row sum reads rows < j, so Mosaic can overlap the two
    dependency chains instead of executing 2n chained steps.

    Correctness of the interleave (each claim mirrors a masked read/write
    in the code):
    - chol_step(j) finalizes L column j (full-column write also zeroes
      the upper part), so inv_step(j) may run immediately after: it needs
      L row j cols < j (finalized at those columns' pivot steps), the
      diagonal d (just written), and X rows < j (finalized by earlier
      inv steps).
    - inv_step here writes the FULL row j (no two_d column restriction):
      cols <= j get X values, cols > j get exact zeros automatically
      (the row sum over X rows k < j reads only zeros there, by
      induction), so X rows are clean for later reads even though later
      columns haven't been factorized yet.
    - later chol trailing updates rewrite X rows with `blk - 0 * rowb`
      (colb is masked to rows > pivot), leaving them bit-identical; later
      chol column writes put an exact 0.0 at (j', k) for j' < k, which is
      already X's value there.
    Output is BIT-IDENTICAL to `_kernel` (per-element arithmetic and
    accumulation order are unchanged; only the temporal interleaving of
    disjoint writes differs) — asserted by the interpret-mode equivalence
    test and the TPU microbench harness."""
    i = pl.program_id(0)
    tile = pl.ds(i * LANES, LANES)
    dma_in = pltpu.make_async_copy(k_hbm_ref.at[:, :, tile], a_ref, sem)
    dma_in.start()
    dma_in.wait()
    out_ref = a_ref
    dtype = a_ref.dtype

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    blocks = _row_blocks(n)
    row_ids_b = {
        h0: jax.lax.broadcasted_iota(jnp.int32, (hn, 1, 1), 0) + h0
        for h0, hn in blocks
    }

    def step(j, _, upd_blocks, read_blocks):
        # ---- factorization: eliminate column j, update rows > j ----
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

        # ---- inversion: form X row j from L row j and X rows < j ----
        # (reads rows < j: disjoint from the trailing update's rows > j,
        # so the two chains above/below can overlap; d comes straight
        # from the factorization half, off the critical path)
        lrow = jnp.where(col_ids < j, out_ref[pl.ds(j, 1), :, :], 0.0)
        lrow_t = jnp.transpose(lrow, (1, 0, 2))             # (n, 1, L)
        onehot_r = (col_ids == j).astype(dtype)
        dr = jnp.transpose(d, (1, 0, 2))                    # (1, 1, L)
        s = 0.0
        for (h0, hn) in read_blocks:
            blk = out_ref[pl.ds(h0, hn), :, :]
            masked = jnp.where(row_ids_b[h0] < j, blk, 0.0)
            s = s + jnp.sum(
                lrow_t[h0 : h0 + hn] * masked, axis=0, keepdims=True
            )
        out_ref[pl.ds(j, 1), :, :] = (onehot_r - s) / dr
        return 0

    for p, (h0, hn) in enumerate(blocks):
        jax.lax.fori_loop(
            h0, h0 + hn,
            functools.partial(
                step, upd_blocks=blocks[p:], read_blocks=blocks[: p + 1]
            ),
            0,
        )

    dma_out = pltpu.make_async_copy(a_ref, out_hbm_ref.at[:, :, tile], sem)
    dma_out.start()
    dma_out.wait()


def _kernel_r2(k_hbm_ref, out_hbm_ref, a_ref, sem, n: int):
    """Rank-2 variant of `_kernel`: two pivot columns per factorization
    step and two inverse rows per back-substitution step.

    The column-loop kernel is bound by per-iteration overhead (loop
    control + dynamic-slice setup), not VMEM bandwidth — measured: the
    two_d support restriction removes 33% of the touched data for only
    3.6% of the time. Rank-2 processing halves the sequential iteration
    count and fuses the two rank-1 trailing updates into ONE pass over the
    trailing blocks (read blk once, subtract both outer products); the
    inversion likewise forms both row sums in one masked pass over the X
    blocks. Uses the active submatrix's symmetry (pivot cross terms read
    directly from the refs as (1, 1, L) slices). Requires even block
    sizes (callers fall back to `_kernel` otherwise). Output is
    bit-comparable up to float reassociation of the fused updates."""
    i = pl.program_id(0)
    tile = pl.ds(i * LANES, LANES)
    dma_in = pltpu.make_async_copy(k_hbm_ref.at[:, :, tile], a_ref, sem)
    dma_in.start()
    dma_in.wait()
    out_ref = a_ref
    dtype = a_ref.dtype

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    blocks = _row_blocks(n)
    row_ids_b = {
        h0: jax.lax.broadcasted_iota(jnp.int32, (hn, 1, 1), 0) + h0
        for h0, hn in blocks
    }

    def chol_step2(t, _, h0, upd_blocks):
        j = h0 + 2 * t
        dj = jnp.sqrt(
            jnp.maximum(out_ref[pl.ds(j, 1), pl.ds(j, 1), :], 1e-30)
        )  # (1, 1, L)
        colj = out_ref[:, pl.ds(j, 1), :]
        cbj = jnp.where(row_ids > j, colj / dj, 0.0)
        rowj = out_ref[pl.ds(j, 1), :, :]
        rbj = jnp.where(col_ids > j, rowj / dj, 0.0)

        # second pivot from the symmetric active submatrix
        g = out_ref[pl.ds(j + 1, 1), pl.ds(j, 1), :] / dj       # L[j+1, j]
        dj1 = jnp.sqrt(
            jnp.maximum(
                out_ref[pl.ds(j + 1, 1), pl.ds(j + 1, 1), :] - g * g, 1e-30
            )
        )
        colj1 = out_ref[:, pl.ds(j + 1, 1), :] - cbj * g
        cbj1 = jnp.where(row_ids > j + 1, colj1 / dj1, 0.0)
        rowj1 = out_ref[pl.ds(j + 1, 1), :, :] - g * rbj
        rbj1 = jnp.where(col_ids > j + 1, rowj1 / dj1, 0.0)

        for (h, hn_) in upd_blocks:  # fused rank-2 trailing update
            blk = out_ref[pl.ds(h, hn_), :, :]
            out_ref[pl.ds(h, hn_), :, :] = (
                blk - cbj[h : h + hn_] * rbj - cbj1[h : h + hn_] * rbj1
            )
        onej = (row_ids == j).astype(dtype)
        onej1 = (row_ids == j + 1).astype(dtype)
        out_ref[:, pl.ds(j, 1), :] = cbj + onej * dj
        out_ref[:, pl.ds(j + 1, 1), :] = cbj1 + onej1 * dj1
        return 0

    for p, (h0, hn) in enumerate(blocks):
        jax.lax.fori_loop(
            0, hn // 2,
            functools.partial(chol_step2, h0=h0, upd_blocks=blocks[p:]), 0,
        )

    def inv_step2(t, _, h0, read_blocks):
        j = h0 + 2 * t
        dj = out_ref[pl.ds(j, 1), pl.ds(j, 1), :]
        dj1 = out_ref[pl.ds(j + 1, 1), pl.ds(j + 1, 1), :]
        g = out_ref[pl.ds(j + 1, 1), pl.ds(j, 1), :]            # L[j+1, j]
        lrowj = jnp.where(col_ids < j, out_ref[pl.ds(j, 1), :, :], 0.0)
        lrowj1 = jnp.where(col_ids < j, out_ref[pl.ds(j + 1, 1), :, :], 0.0)
        ltj = jnp.transpose(lrowj, (1, 0, 2))
        ltj1 = jnp.transpose(lrowj1, (1, 0, 2))
        sj = 0.0
        sj1 = 0.0
        for (h, hn_) in read_blocks:  # one pass serves both row sums
            blk = out_ref[pl.ds(h, hn_), :, :]
            masked = jnp.where(row_ids_b[h] < j, blk, 0.0)
            sj = sj + jnp.sum(ltj[h : h + hn_] * masked, axis=0, keepdims=True)
            sj1 = sj1 + jnp.sum(
                ltj1[h : h + hn_] * masked, axis=0, keepdims=True
            )
        onej = (col_ids == j).astype(dtype)
        onej1 = (col_ids == j + 1).astype(dtype)
        xj = (onej - sj) / dj
        out_ref[pl.ds(j, 1), :, :] = xj
        out_ref[pl.ds(j + 1, 1), :, :] = (onej1 - sj1 - g * xj) / dj1
        return 0

    for p, (h0, hn) in enumerate(blocks):
        jax.lax.fori_loop(
            0, hn // 2,
            functools.partial(inv_step2, h0=h0, read_blocks=blocks[: p + 1]),
            0,
        )

    dma_out = pltpu.make_async_copy(a_ref, out_hbm_ref.at[:, :, tile], sem)
    dma_out.start()
    dma_out.wait()


@functools.partial(
    jax.jit, static_argnames=("interpret", "two_d", "rank2", "interleave")
)
def cholesky_inverse(
    k_batch,
    interpret: bool = False,
    two_d: bool = True,
    rank2: bool = False,
    interleave: bool = False,
):
    """L^{-1} for a batch of SPD matrices. k_batch: (B, n, n) -> (B, n, n).

    n must be a multiple of 8 (f32 sublane tiling); B is padded to LANES
    internally. ``rank2`` (needs even phase-block sizes) processes two
    pivots per sequential step — MEASURED NEGATIVE on v5e (1.17 vs 1.09
    ms at B=128, n=136): the sweeps are VPU-compute-bound, so halving the
    iteration count while doubling per-pass arithmetic loses; kept for
    the record with the interpret-mode equivalence test. ``interleave``
    (round 4) runs chol_step(j) + inv_step(j) in ONE loop of n
    steps instead of two loops of n — unlike rank2 the merged halves are
    independent dependency chains (rows > j vs rows < j), so the halved
    step count actually shortens the critical path; bit-identical output
    (see `_kernel_il`).
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
    if rank2 and all(hn % 2 == 0 for _, hn in _row_blocks(n)):
        kernel = functools.partial(_kernel_r2, n=n)
    elif interleave:
        kernel = functools.partial(_kernel_il, n=n)
    else:
        kernel = functools.partial(_kernel, n=n, two_d=two_d)
    out_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, n, btot), dtype),
        scratch_shapes=[
            pltpu.VMEM((n, n, LANES), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(k_t)
    return jnp.transpose(out_t, (2, 0, 1))[:bsz]
