from .batch import batched_mpc_tick, closed_loop_rollout, make_batch_scene
from .mesh import make_mesh, shard_batch, sharded_rollout

__all__ = [
    "batched_mpc_tick",
    "closed_loop_rollout",
    "make_batch_scene",
    "make_mesh",
    "shard_batch",
    "sharded_rollout",
]
