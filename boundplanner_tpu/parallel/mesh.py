"""Device-mesh scaling: scenario-sharded fleets over a TPU slice.

New design (nothing distributed exists in the reference, SURVEY.md §2.3):
scenes are embarrassingly parallel, so the natural mesh is a single
``scenario`` axis laid out over ICI. Batched pytrees are sharded on their
leading axis with ``NamedSharding``; XLA partitions the vmapped fused tick
with zero cross-device communication in the hot loop, and diagnostics
(success counts, max violations) are combined with ``psum``-style
collectives at the end of a rollout. Multi-host DCN fleets use the same
spec: each host feeds its addressable shard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MPCParams
from .batch import batched_mpc_tick, closed_loop_rollout


def make_mesh(n_devices: int | None = None, axis: str = "scenario") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = "scenario"):
    """Shard every leaf of a batched pytree along its leading axis."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        x = jnp.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def sharded_rollout(carry, q0, obs, cfg: MPCParams, n_ticks: int, mesh: Mesh):
    """Closed-loop fleet rollout, scenario-sharded over the mesh.

    ``carry``/``q0``/``obs`` must carry a leading scenario axis divisible by
    the mesh size. Returns (final carries, per-tick records, diagnostics).
    """
    carry = shard_batch(carry, mesh)
    q0 = shard_batch(q0, mesh)
    obs = shard_batch(obs, mesh)

    @functools.partial(jax.jit, static_argnames=("cfg_", "n_"))
    def run(carry, q0, obs, cfg_, n_):
        final, recs = jax.vmap(
            lambda c, q, o: closed_loop_rollout(c, q, o, cfg_, n_)
        )(carry, q0, obs)
        diag = {
            "success_rate": jnp.mean(recs["success"].astype(jnp.float32)),
            "max_viol": jnp.max(recs["viol"]),
            "mean_phi_final": jnp.mean(recs["phi"][:, -1]),
        }
        return final, recs, diag

    return run(carry, q0, obs, cfg, n_ticks)
