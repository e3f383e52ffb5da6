"""Golden-trajectory regression harness.

The reference's native stack (Ipopt/Pinocchio/CasADi) is not installable
in this environment, so cross-solver parity is anchored differently
(SURVEY.md §4): scipy oracles at the unit level, and THIS harness at the
system level — a fixed-seed single-scene tracking run is recorded once
(float64, default solver settings) and every future change must reproduce
it within tight tolerances. Regenerate deliberately with
``python tests/test_golden_regression.py`` after an intentional
behavior change.
"""

import pathlib

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

GOLDEN = pathlib.Path(__file__).parent / "golden" / "tracking_v1.npz"

N_TICKS = 8


def run_scenario():
    from boundplanner_tpu.config import MPCParams
    from boundplanner_tpu.mpc.node import MPCNode

    q0 = np.array([0.0, 0.0, 0.0, -np.pi / 2, 0.0, np.pi / 2, 0.0])
    node = MPCNode(q0, params=MPCParams())
    p0 = node.p0.copy()
    r0 = R.from_rotvec(np.array(p0[3:])).as_matrix()
    r1 = R.from_euler("z", 20, degrees=True).as_matrix() @ r0
    p_via = [p0[:3].copy(), p0[:3] + np.array([0.05, -0.2, -0.05])]
    node.update_reference(
        [p_via[0], p_via[1]],
        [r0, r1],
        [np.array([0.0, 0.0, 1.0])],
        [np.array([0.0, 0.0, 1.0])],
        [np.array([90, 90, 90, -90, -90, -90]) * np.pi / 180],
        [np.zeros((15, 3))],
        [np.ones(15)],
        [],
    )
    qs, phis = [], []
    for _ in range(N_TICKS):
        node.step()
        qs.append(node.q.copy())
        phis.append(float(node.mpc.phi_current[0]))
    return np.array(qs), np.array(phis)


def test_matches_golden():
    assert GOLDEN.exists(), "golden file missing — run this module directly"
    data = np.load(GOLDEN)
    qs, phis = run_scenario()
    np.testing.assert_allclose(qs, data["qs"], atol=1e-6)
    np.testing.assert_allclose(phis, data["phis"], atol=1e-6)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    GOLDEN.parent.mkdir(exist_ok=True)
    qs, phis = run_scenario()
    np.savez(GOLDEN, qs=qs, phis=phis)
    print(f"golden written: {GOLDEN} (phi end {phis[-1]:.4f})")
