"""Checkpoint / resume of MPC session state.

The reference has no cross-process checkpointing (SURVEY.md §5.4); its
in-session analogs are the Ipopt warm start and the persisted
``limits.npz`` + generated solver ``.so`` (`BoundMPC.py:193-198,248-262`).
Here the XLA compile cache fills the solver-persistence role, and this
module adds real state checkpointing: the entire ``MPCCarry`` (including
the PathState) is a flat pytree of arrays, so a control session can be
snapshotted and resumed bit-exactly — including across processes and for
whole batched fleets.
"""

from __future__ import annotations

import pathlib

import numpy as np

import jax

from .mpc.bound_mpc import MPCCarry
from .path.reference_path import PathState


def save_carry(path, carry: MPCCarry):
    """Serialize an MPCCarry (single scene or batched fleet) to .npz."""
    leaves, treedef = jax.tree.flatten(carry)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez(path, n_leaves=len(leaves), **arrays)


def load_carry(path) -> MPCCarry:
    """Restore an MPCCarry saved by ``save_carry``."""
    data = np.load(path)
    n = int(data["n_leaves"])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    # rebuild the treedef from a structural template
    ps_fields = len(PathState._fields)
    path_state = PathState(*leaves[:ps_fields])
    return MPCCarry(path_state, *leaves[ps_fields:])
