"""Kinematics parity tests.

The oracle is an independent scipy-based FK built directly from the URDF
joint table (`bound_planner/RobotModel/iiwa.urdf:22-147`) — a different
code path (scipy extrinsic-xyz Euler composition) from the library's
hand-rolled rotation matrices, so agreement validates the transcription.
Jacobians are checked against central finite differences, matching
Pinocchio's LOCAL_WORLD_ALIGNED convention.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from boundplanner_tpu.robot import kinematics as kin
from boundplanner_tpu.robot.model import RobotModel, Q_LIM_LOWER, Q_LIM_UPPER

# jit once — keeps the suite fast (op-by-op dispatch is slow on CPU)
FK = jax.jit(kin.fk_frames)
FK_POSE = jax.jit(kin.fk_pose)
JAC = jax.jit(kin.jacobian_fk)
DJAC = jax.jit(kin.djacobian_fk)

# URDF joint table: xyz, rpy (extrinsic x-y-z == URDF convention)
URDF_JOINTS = [
    ([0.0, 0.0, 0.1525], [0.0, 0.0, 0.0]),
    ([0.0, 0.0, 0.2075], [np.pi / 2, 0.0, np.pi]),
    ([0.0, 0.2325, 0.0], [np.pi / 2, 0.0, np.pi]),
    ([0.0, 0.0, 0.1875], [np.pi / 2, 0.0, 0.0]),
    ([0.0, 0.2125, 0.0], [-np.pi / 2, np.pi, 0.0]),
    ([0.0, 0.0, 0.1875], [np.pi / 2, 0.0, 0.0]),
    ([0.0, 0.0796, 0.0], [-np.pi / 2, np.pi, 0.0]),
]
EE_OFFSET = ([0.0, 0.0, 0.21], [0.0, -1.575, -1.575])
LINK4_COL = [0.0, 0.3, 0.0]
EE_COL = [0.0, 0.0, 0.13]


def oracle_frames(q):
    """Independent FK oracle with scipy rotations."""
    r = np.eye(3)
    p = np.zeros(3)
    frames = []
    for i, (xyz, rpy) in enumerate(URDF_JOINTS):
        p = p + r @ np.asarray(xyz)
        r = r @ R.from_euler("xyz", rpy).as_matrix() @ R.from_euler("z", q[i]).as_matrix()
        frames.append((r.copy(), p.copy()))
    r_ee = r @ R.from_euler("xyz", EE_OFFSET[1]).as_matrix()
    p_ee = p + r @ np.asarray(EE_OFFSET[0])
    r4, p4 = frames[3]
    p_l4 = p4 + r4 @ np.asarray(LINK4_COL)
    p_eec = p + r @ np.asarray(EE_COL)
    return frames, r_ee, p_ee, p_l4, p_eec


def random_q(rng, n=30):
    return rng.uniform(Q_LIM_LOWER, Q_LIM_UPPER, size=(n, 7))


def test_fk_vs_oracle(rng):
    for q in random_q(rng):
        frames, r_ee, p_ee, p_l4, p_eec = oracle_frames(q)
        f = jax.tree.map(np.asarray, FK(jnp.asarray(q)))
        np.testing.assert_allclose(f["p_ee"], p_ee, atol=1e-12)
        np.testing.assert_allclose(f["r_ee"], r_ee, atol=1e-12)
        for i in range(7):
            np.testing.assert_allclose(f["r"][i], frames[i][0], atol=1e-12)
            np.testing.assert_allclose(f["p"][i], frames[i][1], atol=1e-12)
        # collision frames: joints 3..7 origins + link4_col + ee_col
        for k, ji in enumerate(range(2, 7)):
            np.testing.assert_allclose(f["p_col"][k], frames[ji][1], atol=1e-12)
        np.testing.assert_allclose(f["p_col"][5], p_l4, atol=1e-12)
        np.testing.assert_allclose(f["p_col"][6], p_eec, atol=1e-12)


def test_fk_home_pose():
    """At q=0 the arm is fully stretched upward: EE position must be on the
    z axis at the summed link lengths."""
    f = jax.tree.map(np.asarray, FK(jnp.zeros(7)))
    z_total = 0.1525 + 0.2075 + 0.2325 + 0.1875 + 0.2125 + 0.1875 + 0.0796 + 0.21
    np.testing.assert_allclose(f["p_ee"], [0, 0, z_total], atol=1e-12)


def test_fk_pose_rotvec(rng):
    for q in random_q(rng, 5):
        pose = np.asarray(FK_POSE(jnp.asarray(q)))
        _, r_ee, p_ee, _, _ = oracle_frames(q)
        np.testing.assert_allclose(pose[:3], p_ee, atol=1e-12)
        np.testing.assert_allclose(pose[3:], R.from_matrix(r_ee).as_rotvec(), atol=1e-9)


def test_jacobian_finite_difference(rng):
    """LOCAL_WORLD_ALIGNED: linear rows = d(p_ee)/dq; angular rows satisfy
    skew(Jw dq) = dR R^T."""
    eps = 1e-7
    for q in random_q(rng, 4):
        jac = np.asarray(JAC(jnp.asarray(q)))
        for i in range(7):
            dq = np.zeros(7)
            dq[i] = eps
            f_p = jax.tree.map(np.asarray, FK(jnp.asarray(q + dq)))
            f_m = jax.tree.map(np.asarray, FK(jnp.asarray(q - dq)))
            dpos = (f_p["p_ee"] - f_m["p_ee"]) / (2 * eps)
            np.testing.assert_allclose(jac[:3, i], dpos, atol=1e-6)
            dr = (f_p["r_ee"] - f_m["r_ee"]) / (2 * eps)
            omega_mat = dr @ f_p["r_ee"].T
            omega = np.array([omega_mat[2, 1], omega_mat[0, 2], omega_mat[1, 0]])
            np.testing.assert_allclose(jac[3:, i], omega, atol=1e-6)


def test_djacobian_finite_difference(rng):
    eps = 1e-6
    for q in random_q(rng, 5):
        dq = rng.normal(size=7)
        dj = np.asarray(DJAC(jnp.asarray(q), jnp.asarray(dq)))
        j_p = np.asarray(JAC(jnp.asarray(q + eps * dq)))
        j_m = np.asarray(JAC(jnp.asarray(q - eps * dq)))
        np.testing.assert_allclose(dj, (j_p - j_m) / (2 * eps), atol=1e-5)


def test_velocity_consistency(rng):
    """EE velocity from J dq must match d/dt fk_pos along the flow."""
    for q in random_q(rng, 5):
        dq = rng.normal(size=7)
        v = np.asarray(kin.velocity_ee(jnp.asarray(q), jnp.asarray(dq)))
        _, vjvp = jax.jvp(kin.fk_pos, (jnp.asarray(q),), (jnp.asarray(dq),))
        np.testing.assert_allclose(v, np.asarray(vjvp), atol=1e-10)


def test_vmap_and_jit(rng):
    qs = jnp.asarray(random_q(rng, 16))
    poses = jax.jit(jax.vmap(kin.fk_pose))(qs)
    assert poses.shape == (16, 6)
    jacs = jax.jit(jax.vmap(kin.jacobian_fk))(qs)
    assert jacs.shape == (16, 6, 7)
    single = np.asarray(kin.fk_pose(qs[3]))
    np.testing.assert_allclose(np.asarray(poses[3]), single, atol=1e-12)


def test_robot_model_facade():
    m = RobotModel()
    p, jac, djac = m.forward_kinematics(np.zeros(7), np.zeros(7))
    assert p.shape == (6,) and jac.shape == (6, 7) and djac.shape == (6, 7)
    np.testing.assert_allclose(djac, 0, atol=1e-12)
    lims = m.get_robot_limits()
    assert lims[6] == 35.0 and lims[7] == -35.0


def test_inverse_kinematics(rng):
    m = RobotModel()
    q_target = np.array([0.3, 0.5, -0.2, -1.2, 0.4, 1.1, 0.2])
    f = jax.tree.map(np.asarray, FK(jnp.asarray(q_target)))
    q0 = q_target + 0.2 * rng.normal(size=7)
    q_ik = m.inverse_kinematics(f["p_ee"], f["r_ee"], q0)
    f_ik = jax.tree.map(np.asarray, FK(jnp.asarray(q_ik)))
    assert np.linalg.norm(f_ik["p_ee"] - f["p_ee"]) < 1e-4
    rot_err = R.from_matrix(f_ik["r_ee"] @ f["r_ee"].T).as_rotvec()
    assert np.linalg.norm(rot_err) < 1e-3


def test_gen3_chain(rng):
    """Gen3 FK sanity: matches an independent scipy composition and keeps
    the Jacobian convention (finite-difference check)."""
    chain = kin.gen3_chain()
    m = RobotModel(robot="gen3")
    q = rng.uniform(-1.5, 1.5, 7)
    p, jac, djac = m.forward_kinematics(q, np.zeros(7))
    assert np.isfinite(p).all() and jac.shape == (6, 7)
    eps = 1e-7
    for i in range(7):
        dq = np.zeros(7)
        dq[i] = eps
        pp = m.fk_pos(q + dq)
        pm = m.fk_pos(q - dq)
        np.testing.assert_allclose(jac[:3, i], (pp - pm) / (2 * eps), atol=1e-6)
    # at q=0 the gen3 EE sits on the base z axis (chain alternates +-y
    # offsets that cancel in x but not exactly; just check height range)
    p0 = m.fk_pos(np.zeros(7))
    assert 0.7 < abs(p0[2]) + np.linalg.norm(p0[:2]) < 1.4
