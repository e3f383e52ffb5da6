"""SO(3) utility parity tests against scipy and against direct transcriptions
of the reference formulas (`utils/optimization_functions.py:35-104`)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from boundplanner_tpu.utils import so3


def random_rotvecs(rng, n=200):
    v = rng.normal(size=(n, 3))
    scales = rng.uniform(0, np.pi - 1e-3, size=(n, 1))
    rv = v / np.linalg.norm(v, axis=1, keepdims=True) * scales
    rv[0] = 0.0
    rv[1] = [1e-9, 0, 0]
    rv[2] = [np.pi - 1e-7, 0, 0]
    return rv


def test_rotvec_roundtrip_vs_scipy(rng):
    rvs = random_rotvecs(rng)
    mats = R.from_rotvec(rvs).as_matrix()
    ours = jax.vmap(so3.rotvec_to_matrix)(jnp.asarray(rvs))
    np.testing.assert_allclose(np.asarray(ours), mats, atol=1e-12)

    back = jax.vmap(so3.matrix_to_rotvec)(jnp.asarray(mats))
    ref = R.from_matrix(mats).as_rotvec()
    np.testing.assert_allclose(np.asarray(back), ref, atol=1e-9)


def test_quat_vs_scipy(rng):
    rvs = random_rotvecs(rng)
    mats = R.from_rotvec(rvs).as_matrix()
    ours = np.asarray(jax.vmap(so3.matrix_to_quat)(jnp.asarray(mats)))
    ref = R.from_matrix(mats).as_quat()  # (x, y, z, w)
    ref = np.concatenate([ref[:, 3:], ref[:, :3]], axis=1)
    sign = np.where(ref[:, :1] < 0, -1.0, 1.0)
    ref = ref * sign
    np.testing.assert_allclose(np.abs(ours), np.abs(ref), atol=1e-9)
    # same rotation
    np.testing.assert_allclose(
        np.abs(np.sum(ours * ref, axis=1)), np.ones(len(ref)), atol=1e-9
    )


def test_euler_zyx_vs_scipy(rng):
    rvs = random_rotvecs(rng)
    mats = R.from_rotvec(rvs).as_matrix()
    ours = np.asarray(jax.vmap(so3.matrix_to_euler_zyx)(jnp.asarray(mats)))
    ref = R.from_matrix(mats).as_euler("zyx")
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def _ref_jac_inv(axis, sign):
    """Direct numpy transcription of the reference formula
    (`optimization_functions.py:35-66`) as the oracle."""
    angle = np.linalg.norm(axis) + 1e-6
    om = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return (
        np.eye(3)
        + sign * 0.5 * om
        + (1 / angle**2 - (1 + np.cos(angle)) / (2 * angle * np.sin(angle))) * om @ om
    )


@pytest.mark.parametrize("fn,sign", [(so3.jac_so3_inv_right, 1), (so3.jac_so3_inv_left, -1)])
def test_jac_so3_inv(rng, fn, sign):
    for _ in range(50):
        axis = rng.normal(size=3)
        axis *= rng.uniform(0.05, 3.0) / np.linalg.norm(axis)
        ours = np.asarray(fn(jnp.asarray(axis)))
        ref = _ref_jac_inv(axis, sign)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_jac_so3_inv_small_angle():
    # series limit: I +/- O/2 + O^2/12
    axis = np.array([1e-8, -2e-8, 5e-9])
    ours = np.asarray(so3.jac_so3_inv_right(jnp.asarray(axis)))
    np.testing.assert_allclose(ours, np.eye(3), atol=1e-7)
    assert np.all(np.isfinite(ours))


def test_jac_inverse_property(rng):
    """J_r^{-1}(phi) must invert the analytic right Jacobian
    J_r(phi) = I - (1-cos t)/t^2 O + (t - sin t)/t^3 O^2."""
    for _ in range(20):
        phi = rng.normal(size=3)
        t = np.linalg.norm(phi)
        om = np.asarray(so3.skew(jnp.asarray(phi)))
        jr = (
            np.eye(3)
            - (1 - np.cos(t)) / t**2 * om
            + (t - np.sin(t)) / t**3 * om @ om
        )
        jr_inv = np.asarray(so3.jac_so3_inv_right(jnp.asarray(phi)))
        np.testing.assert_allclose(jr_inv @ jr, np.eye(3), atol=1e-4)


def test_rodrigues_vs_scipy(rng):
    for _ in range(20):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = rng.uniform(-3, 3)
        ours = np.asarray(so3.rodrigues(jnp.asarray(axis), ang))
        ref = R.from_rotvec(axis * ang).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_gram_schmidt():
    v = jnp.array([0.0, 0.0, 1.0])
    b = jnp.array([1.0, 1.0, 1.0])
    out = np.asarray(so3.gram_schmidt(v, b))
    np.testing.assert_allclose(out, [1.0, 1.0, 0.0], atol=1e-12)
