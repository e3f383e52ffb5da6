"""Pallas TPU kernel: batched segment-to-polytope closest points.

The hottest small-geometry op in the engine is the per-obstacle line
projection QP (`ConvexSetFinder.py:52-99,491-510`): for every MPC tick,
6 links x n_obstacles instances; for a batched fleet, thousands per step.
The generic IPM (`ops.qp`) solves them exactly but spends its time in tiny
Cholesky factorizations that map poorly onto the MXU.

This kernel instead runs, entirely in VMEM on the VPU with the *batch* as
the 128-lane axis:

  repeat OUTER times:
    z   <- closest point of segment [p0, p1] to x        (closed form)
    x   <- Dykstra projection of z onto {A y <= b}       (S sweeps over rows)

Alternating projections between two convex sets converge to a pair of
closest points; Dykstra's corrections make each polytope projection exact
in the limit. All operations are element-wise fused vector math — no
linear algebra, no control-flow divergence, lockstep across lanes.

Layout: problems are padded to multiples of 128 lanes; row data is kept as
(R, 3) scalars broadcast across lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
OUTER_ITERS = 10
DYKSTRA_SWEEPS = 4


def _kernel(a_ref, b_ref, p0_ref, p1_ref, x_ref, phi_ref, r_rows: int):
    """One tile of LANES problems.

    a_ref:  (R, 3, LANES)   half-space normals (rows may be zero padding)
    b_ref:  (R, LANES)
    p0_ref: (3, LANES), p1_ref: (3, LANES)
    x_ref:  (3, LANES) out — closest polytope point
    phi_ref:(1, LANES) out — segment parameter of the closest segment point
    """
    p0 = p0_ref[:]          # (3, L)
    p1 = p1_ref[:]
    d = p1 - p0
    denom = jnp.maximum(jnp.sum(d * d, axis=0, keepdims=True), 1e-12)

    a = a_ref[:]            # (R, 3, L)
    b = b_ref[:]            # (R, L)
    a_norm2 = jnp.maximum(jnp.sum(a * a, axis=1), 1e-12)  # (R, L)

    def seg_point(x):
        phi = jnp.sum((x - p0) * d, axis=0, keepdims=True) / denom
        phi = jnp.clip(phi, 0.0, 1.0)
        return p0 + phi * d, phi

    def dykstra(z):
        # project z onto the polytope: S sweeps of per-row corrections.
        # The row loop is unrolled with static indices (Mosaic has no
        # dynamic_slice); rows are few (<= 16).
        y0 = z
        e0 = tuple(jnp.zeros_like(p0) for _ in range(r_rows))

        def sweep(_, carry):
            y, e = carry
            e = list(e)
            for r in range(r_rows):
                w = y + e[r]
                viol = (jnp.sum(a[r] * w, axis=0) - b[r]) / a_norm2[r]  # (L,)
                step = jnp.maximum(viol, 0.0)[None, :] * a[r]
                y = w - step
                e[r] = step
            return y, tuple(e)

        y, _ = jax.lax.fori_loop(0, DYKSTRA_SWEEPS, sweep, (y0, e0))
        return y

    def outer(_, x):
        z, _ = seg_point(x)
        return dykstra(z)

    x = dykstra(p0)  # start from the projection of p0
    x = jax.lax.fori_loop(0, OUTER_ITERS, outer, x)
    _, phi = seg_point(x)
    x_ref[:] = x
    phi_ref[:] = phi


@functools.partial(jax.jit, static_argnames=("interpret",))
def line_polytope_projection(a, b, p0, p1, interpret: bool = False):
    """Batched closest points between segments and polytopes.

    a: (B, R, 3), b: (B, R), p0/p1: (B, 3). Returns (x (B,3), phi (B,),
    dist (B,)). B is padded to a multiple of 128 internally.
    """
    bsz, r_rows, _ = a.shape
    dtype = a.dtype
    pad = (-bsz) % LANES
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, r_rows, 3), dtype)], axis=0)
        b = jnp.concatenate([b, jnp.ones((pad, r_rows), dtype)], axis=0)
        p0 = jnp.concatenate([p0, jnp.zeros((pad, 3), dtype)], axis=0)
        p1 = jnp.concatenate([p1, jnp.ones((pad, 3), dtype)], axis=0)
    btot = bsz + pad

    # lane-major layout
    a_t = jnp.transpose(a, (1, 2, 0))   # (R, 3, B)
    b_t = jnp.transpose(b, (1, 0))      # (R, B)
    p0_t = jnp.transpose(p0, (1, 0))    # (3, B)
    p1_t = jnp.transpose(p1, (1, 0))

    grid = (btot // LANES,)
    kernel = functools.partial(_kernel, r_rows=r_rows)
    x_t, phi_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r_rows, 3, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_rows, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, btot), dtype),
            jax.ShapeDtypeStruct((1, btot), dtype),
        ],
        interpret=interpret,
    )(a_t, b_t, p0_t, p1_t)

    x = jnp.transpose(x_t, (1, 0))[:bsz]
    phi = phi_t[0, :bsz]
    seg = p0[:bsz] + phi[:, None] * (p1[:bsz] - p0[:bsz])
    dist = jnp.linalg.norm(x - seg, axis=1)
    return x, phi, dist


# ---------------------------------------------------------------------------
# dispatch boundary: IPM exactness off-TPU, lane-batched kernel on TPU
# ---------------------------------------------------------------------------


def _seg_closest_ipm(a, b, p0, p1):
    from .qp import solve_line_projection

    def one(a_i, b_i, p0_i, p1_i):
        x, phi, _ = solve_line_projection(a_i, b_i, p0_i, p1_i, iters=25)
        return x, phi

    return jax.vmap(one)(a, b, p0, p1)


@jax.custom_batching.custom_vmap
def seg_poly_closest(a, b, p0, p1):
    """Closest pair between segments and polytopes, batched on the LEADING
    axis: a (B, R, 3), b (B, R), p0/p1 (B, 3) -> (x (B, 3), phi (B,)).

    On TPU float32 the whole batch runs in the all-VMEM Dykstra kernel
    (`line_polytope_projection`); elsewhere (CPU tests, float64 planner
    paths) it falls back to the exact vmapped IPM — bit-identical to the
    pre-kernel behavior. Extra vmap levels (links, scenes) FOLD into the
    kernel's lane axis via the batching rule below, which is what lets the
    fused MPC tick's scene-vmap reach one big kernel launch instead of
    B x 6 x 16 tiny IPM instances (the reference's per-tick hot loop,
    `BoundMPC.py:480-498`, ran one qpOASES solve per instance).
    """
    backend = jax.default_backend()
    if backend in ("tpu", "axon") and a.dtype == jnp.float32:
        x, phi, _ = line_polytope_projection(a, b, p0, p1)
        return x, phi
    return _seg_closest_ipm(a, b, p0, p1)


@seg_poly_closest.def_vmap
def _seg_poly_closest_vmap_rule(axis_size, in_batched, a, b, p0, p1):
    # broadcast any unbatched operand, fold the vmap axis into the problem
    # axis, recurse (the recursive call is not itself being vmapped, so it
    # lands in the base case — or folds again under an outer vmap level)
    ops = []
    for x, batched in zip((a, b, p0, p1), in_batched):
        if not batched:
            x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        ops.append(x.reshape((axis_size * x.shape[1],) + x.shape[2:]))
    x_flat, phi_flat = seg_poly_closest(*ops)
    return (
        (x_flat.reshape(axis_size, -1, 3), phi_flat.reshape(axis_size, -1)),
        (True, True),
    )
