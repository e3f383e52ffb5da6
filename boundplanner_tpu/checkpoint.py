"""Checkpoint / resume of MPC session state.

The reference has no cross-process checkpointing (SURVEY.md §5.4); its
in-session analogs are the Ipopt warm start and the persisted
``limits.npz`` + generated solver ``.so`` (`BoundMPC.py:193-198,248-262`).
Here the XLA compile cache fills the solver-persistence role, and this
module adds real state checkpointing: the entire ``MPCCarry`` (including
the PathState) is a flat pytree of arrays, so a control session can be
snapshotted and resumed bit-exactly — including across processes and for
whole batched fleets.

Leaves are stored under their field names (``path.p``, ``x_prev``, ...)
with a format version tag, so a checkpoint written before a field
reordering either still loads correctly or fails loudly — never silently
mis-assigns same-shaped leaves.
"""

from __future__ import annotations

import numpy as np

from .mpc.bound_mpc import MPCCarry
from .path.reference_path import PathState

_FORMAT_VERSION = 2


def _field_names():
    names = []
    for f in MPCCarry._fields:
        if f == "path":
            names.extend(f"path.{pf}" for pf in PathState._fields)
        else:
            names.append(f)
    return names


def save_carry(path, carry: MPCCarry):
    """Serialize an MPCCarry (single scene or batched fleet) to .npz."""
    arrays = {}
    for f in MPCCarry._fields:
        val = getattr(carry, f)
        if f == "path":
            for pf in PathState._fields:
                arrays[f"path.{pf}"] = np.asarray(getattr(val, pf))
        else:
            arrays[f] = np.asarray(val)
    np.savez(path, __version__=_FORMAT_VERSION, **arrays)


def load_carry(path) -> MPCCarry:
    """Restore an MPCCarry saved by ``save_carry``.

    Raises ``ValueError`` if the checkpoint's field set does not match the
    current MPCCarry/PathState schema (e.g. written by a different code
    version), instead of guessing a positional assignment.
    """
    data = np.load(path)
    version = int(data["__version__"]) if "__version__" in data else 1
    if version != _FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format v{version} != supported v{_FORMAT_VERSION}"
        )
    expected = set(_field_names())
    stored = {k for k in data.files if k != "__version__"}
    if stored != expected:
        missing = sorted(expected - stored)
        extra = sorted(stored - expected)
        raise ValueError(
            f"checkpoint schema mismatch: missing fields {missing}, "
            f"unknown fields {extra}"
        )
    path_state = PathState(**{pf: data[f"path.{pf}"] for pf in PathState._fields})
    rest = {f: data[f] for f in MPCCarry._fields if f != "path"}
    return MPCCarry(path=path_state, **rest)
