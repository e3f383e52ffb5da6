"""BoundMPC end-to-end behavior tests (single scene, CPU).

These are the build's equivalent of the reference's executable-example
acceptance tests (SURVEY.md §4): track a path, make monotone progress,
respect joint limits and convex-set constraints.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from boundplanner_tpu.config import MPCParams
from boundplanner_tpu.mpc.node import MPCNode
from boundplanner_tpu.robot.model import DQ_LIM, Q_LIM_LOWER, Q_LIM_UPPER, U_MAX

Q0 = np.array([0.0, 0.0, 0.0, -np.pi / 2, 0.0, np.pi / 2, 0.0])


def free_sets(n=1):
    a = [np.zeros((15, 3))] * n
    b = [np.ones(15)] * n
    return a, b


@pytest.fixture(scope="module")
def tracked_node():
    """Run a straight-line tracking scenario once; several tests assert on it."""
    node = MPCNode(Q0)
    p0 = node.p0.copy()
    r0 = R.from_rotvec(np.array(p0[3:])).as_matrix()
    p_via = [p0[:3].copy(), p0[:3] + np.array([0.0, -0.25, 0.0])]
    r_via = [r0, r0]
    bp1 = [np.array([0.0, 0.0, 1.0])]
    br1 = [np.array([0.0, 0.0, 1.0])]
    e_r_bound = [np.array([90, 90, 90, -90, -90, -90]) * np.pi / 180]
    a_sets, b_sets = free_sets()
    node.update_reference(p_via, r_via, bp1, br1, e_r_bound, a_sets, b_sets, [])

    history = {"phi": [], "q": [], "dq": [], "p": [], "fails": []}
    for _ in range(15):
        node.step()
        history["phi"].append(float(node.mpc.phi_current[0]))
        history["q"].append(node.q.copy())
        history["dq"].append(node.dq.copy())
        history["p"].append(node.p_lie.copy())
        history["fails"].append(node.fails[-1])
    return node, p0, history


def test_progress(tracked_node):
    node, p0, h = tracked_node
    phis = np.array(h["phi"])
    # monotone-ish progress, most of the path covered
    assert phis[-1] > 0.2
    assert np.all(np.diff(phis) > -1e-6)


def test_no_failures(tracked_node):
    _, _, h = tracked_node
    assert sum(h["fails"]) == 0


def test_joint_limits(tracked_node):
    _, _, h = tracked_node
    q = np.array(h["q"])
    dq = np.array(h["dq"])
    assert np.all(q < Q_LIM_UPPER + 1e-6) and np.all(q > Q_LIM_LOWER - 1e-6)
    assert np.all(np.abs(dq) < DQ_LIM + 1e-6)


def test_path_deviation_bounded(tracked_node):
    """Orthogonal deviation from the straight-line path stays small."""
    _, p0, h = tracked_node
    p = np.array(h["p"])[:, :3]
    dev = np.linalg.norm(p - np.array([p0[0], 0, p0[2]]) * 0 - p0[:3], axis=1)
    # deviation orthogonal to the -y direction
    orth = np.sqrt((p[:, 0] - p0[0]) ** 2 + (p[:, 2] - p0[2]) ** 2)
    assert orth.max() < 0.05


def test_rotation_held(tracked_node):
    """Constant rotation reference: EE orientation should stay close to r0."""
    _, p0, h = tracked_node
    p = np.array(h["p"])
    r0 = R.from_rotvec(np.array(p0[3:]))
    for row in p[::5]:
        ang = np.linalg.norm((R.from_rotvec(row[3:]) * r0.inv()).as_rotvec())
        assert ang < 0.35  # within the 90 deg band, and loosely tracked


def test_convex_set_constraint():
    """With a tight box set, the EE must stay inside it."""
    node = MPCNode(Q0)
    p0 = node.p0.copy()
    r0 = R.from_rotvec(np.array(p0[3:])).as_matrix()
    p_goal = p0[:3] + np.array([0.0, -0.2, 0.0])
    # box around the segment with 4 cm margin orthogonal
    a = np.vstack([np.eye(3), -np.eye(3), np.zeros((9, 3))])
    margin = np.array([0.04, 0.25, 0.04])
    b = np.concatenate([p0[:3] + margin, -(p0[:3] - margin), 10 * np.ones(9)])
    node.update_reference(
        [p0[:3].copy(), p_goal],
        [r0, r0],
        [np.array([0.0, 0.0, 1.0])],
        [np.array([0.0, 0.0, 1.0])],
        [np.array([90, 90, 90, -90, -90, -90]) * np.pi / 180],
        [a],
        [b],
        [],
    )
    for _ in range(12):
        node.step()
        viol = np.max(a @ node.p_lie[:3] - b)
        assert viol < 5e-3  # within set (slack tolerance)
    assert float(node.mpc.phi_current[0]) > 0.12
