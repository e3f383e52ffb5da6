"""Reference path construction + reference/error function unit tests."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from boundplanner_tpu.path.reference_path import (
    build_path,
    path_advance,
    path_window,
)
from boundplanner_tpu.path import ref_fns


def simple_path(nr_segs=4):
    p_via = [
        np.array([0.0, 0.0, 0.5]),
        np.array([0.2, 0.0, 0.5]),
        np.array([0.2, 0.3, 0.5]),
        np.array([0.2, 0.3, 0.8]),
    ]
    r0 = np.eye(3)
    r1 = R.from_euler("z", 30, degrees=True).as_matrix()
    r_via = [r0, r0, r1, r1]
    bp1 = [np.array([0.0, 0.0, 1.0])] * 3
    br1 = [np.array([1.0, 0.0, 0.0])] * 3
    e_r_bound = [np.array([0.5, 0.5, 0.5, -0.5, -0.5, -0.5])] * 3
    a_sets = [np.zeros((15, 3))] * 3
    b_sets = [np.ones(15)] * 3
    return build_path(p_via, r_via, bp1, br1, e_r_bound, a_sets, b_sets, nr_segs)


def test_path_lengths_and_switch():
    st = simple_path()
    seg = np.asarray(st.seg_len)
    np.testing.assert_allclose(seg[1:4], [0.2, 0.3, 0.3], atol=1e-12)
    assert float(st.phi_max) == pytest.approx(0.8)
    win = path_window(st, 4)
    np.testing.assert_allclose(
        np.asarray(win["phi_switch"]), [0.0, 0.2, 0.5, 0.8, 1.8], atol=1e-12
    )  # padded segments get length 1 (ref `ReferencePath.py:104-105`)


def test_basis_orthogonality():
    st = simple_path()
    win = path_window(st, 4)
    for i in range(3):
        dp = np.asarray(win["dp_ref"])[i][:3]
        bp1 = np.asarray(win["bp1"])[i]
        bp2 = np.asarray(win["bp2"])[i]
        assert abs(dp @ bp1) < 1e-9
        assert abs(dp @ bp2) < 1e-9
        assert abs(bp1 @ bp2) < 1e-9
        np.testing.assert_allclose(np.linalg.norm(bp1), 1.0, atol=1e-12)


def test_rotation_deltas():
    st = simple_path()
    # segment 1 (index 1 in dr arrays) carries the 30 deg z rotation scaled
    # by 1/length
    dr = np.asarray(st.dr)[1]
    np.testing.assert_allclose(
        dr, [0, 0, np.deg2rad(30) / 0.3], atol=1e-9
    )
    iw = np.asarray(st.iw)
    np.testing.assert_allclose(iw[2], [0, 0, np.deg2rad(30)], atol=1e-9)
    np.testing.assert_allclose(iw[3], iw[2], atol=1e-9)


def test_advance():
    st = simple_path()
    assert int(st.sector) == 0
    st2 = path_advance(st, jnp.asarray(True))
    assert int(st2.sector) == 1 and bool(st2.switched)
    win = path_window(st2, 4)
    np.testing.assert_allclose(np.asarray(win["p_ref"])[0][:3], [0.2, 0.0, 0.5])
    # cannot advance past num_sectors
    st3 = path_advance(st2._replace(sector=st2.num_sectors), jnp.asarray(True))
    assert int(st3.sector) == int(st2.num_sectors)
    assert not bool(st3.switched)


def test_reference_function_segments():
    st = simple_path()
    win = path_window(st, 4)
    win = dict(win)
    win["v1"] = win["br1"]
    win["v2"] = win["dp_normed"]
    win["v3"] = win["br2"]
    n = 15
    split = jnp.asarray([0, 5, 9, n, n], jnp.int32)

    # step inside segment 0
    p = jnp.asarray(np.array([0.1, 0.0, 0.5, 0, 0, 0.0]))
    v = jnp.zeros(6)
    ref = ref_fns.reference_function(win, split, 3, p, v, n, 4)
    assert float(ref["phi"]) == pytest.approx(0.1, abs=1e-9)
    np.testing.assert_allclose(np.asarray(ref["p_d"])[:3], [0.1, 0, 0.5], atol=1e-9)

    # same pose evaluated on segment 1 (idx past split[1])
    p2 = jnp.asarray(np.array([0.2, 0.1, 0.5, 0, 0, 0.0]))
    ref2 = ref_fns.reference_function(win, split, 7, p2, v, n, 4)
    assert float(ref2["phi"]) == pytest.approx(0.2 + 0.1, abs=1e-9)
    np.testing.assert_allclose(np.asarray(ref2["p_d"])[:3], [0.2, 0.1, 0.5], atol=1e-9)

    # terminal-next selection (split[1] < N, split[2] < N -> j = 3)
    assert int(ref["seg_next_term"]) == 3
    ref3 = ref_fns.reference_function(
        win, jnp.asarray([0, n, n, n, n], jnp.int32), 3, p, v, n, 4
    )
    assert int(ref3["seg_next_term"]) == 1


def test_error_function_zero_on_reference():
    """A pose exactly on the reference has zero position error and the
    parallel rotation error matches the initial decomposition."""
    st = simple_path()
    win = dict(path_window(st, 4))
    win["v1"] = win["br1"]
    win["v2"] = win["dp_normed"]
    win["v3"] = win["br2"]
    n = 15
    split = jnp.asarray([0, n, n, n, n], jnp.int32)
    params = {
        "i_omega_ref_0": jnp.zeros(3),
        "jac_dtau_l": jnp.eye(3),
        "jac_dtau_r": jnp.eye(3),
        "dtau_init": jnp.zeros((4, 3)),
        "dtau_init_par": jnp.zeros((4, 3)),
        "dtau_init_orth1": jnp.zeros((4, 3)),
        "dtau_init_orth2": jnp.zeros((4, 3)),
    }
    p = jnp.asarray(np.array([0.15, 0.0, 0.5, 0, 0, 0.0]))
    v = jnp.asarray(np.array([1.0, 0, 0, 0, 0, 0.0])) * 0.1
    ref = ref_fns.reference_function(win, split, 3, p, v, n, 4)
    err = ref_fns.error_function(ref, params, split, 3, p, v, p[3:], n, 4)
    np.testing.assert_allclose(np.asarray(err["e_p"]), 0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(err["e_r"]), 0, atol=1e-9)
    # velocity error: v is along the path with dphi = 0.1 -> de_p = 0
    assert float(ref["dphi"]) == pytest.approx(0.1)
    np.testing.assert_allclose(np.asarray(err["de_p"]), 0, atol=1e-9)
