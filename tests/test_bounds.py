"""Polynomial error-bound families vs their defining interpolation
conditions (ref `mpc_utils_casadi.py:95-584`; conditions verified against
the reference closed forms to <1e-9)."""

import numpy as np

import jax.numpy as jnp

from boundplanner_tpu.mpc import bounds


def poly_d(coeffs, t, order=0):
    p = np.poly1d(np.asarray(coeffs, float))
    for _ in range(order):
        p = p.deriv()
    return p(t)


def test_fourth_order_conditions():
    phi0, phi1, e0, e1, s, em = 0.3, 1.7, 0.05, 0.12, 0.4, 0.45
    c = bounds.compute_bound_params(phi0, phi1, e0, e1, s, em)
    mid = 0.5 * (phi0 + phi1)
    np.testing.assert_allclose(poly_d(c, phi0), e0, atol=1e-12)
    np.testing.assert_allclose(poly_d(c, phi1), e1, atol=1e-12)
    np.testing.assert_allclose(poly_d(c, phi0, 1), s, atol=1e-12)
    np.testing.assert_allclose(poly_d(c, phi1, 1), -s, atol=1e-12)
    np.testing.assert_allclose(poly_d(c, mid), em, atol=1e-12)


def test_fourth_order_general_slopes():
    phi0, phi1, e0, e1, s0, s1, em = 0.1, 2.0, 0.02, 0.3, 0.7, 0.2, 0.5
    c = bounds.compute_bound_params_four(phi0, phi1, e0, e1, s0, s1, em)
    np.testing.assert_allclose(poly_d(c, phi0, 1), s0, atol=1e-12)
    np.testing.assert_allclose(poly_d(c, phi1, 1), -s1, atol=1e-12)
    val = bounds.fourth_order_error_bound(1.2, phi0, phi1, e0, e1, s0, s1, em)
    np.testing.assert_allclose(float(val), poly_d(c, 1.2), atol=1e-12)


def test_sixth_order_flat_c2_ends():
    phi0, phi1, e0, e1, em = 0.3, 1.7, 0.05, 0.12, 0.45
    c = bounds.compute_bound_params_six(phi0, phi1, e0, e1, 99.0, em)
    assert len(c) == 7
    mid = 0.5 * (phi0 + phi1)
    for t, v in ((phi0, e0), (phi1, e1), (mid, em)):
        np.testing.assert_allclose(poly_d(c, t), v, atol=1e-9)
    for t in (phi0, phi1):
        np.testing.assert_allclose(poly_d(c, t, 1), 0.0, atol=1e-9)
        np.testing.assert_allclose(poly_d(c, t, 2), 0.0, atol=1e-8)
    # slope argument is inert, like the reference's active family
    c2 = bounds.compute_bound_params_six(phi0, phi1, e0, e1, -3.0, em)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c2), atol=0)


def test_third_order_initial_conditions():
    phi0, phi1, e0, e1, de0, dde0 = 0.2, 1.1, 0.04, 0.2, 0.3, -0.8
    c = bounds.compute_bound_params_three(phi0, phi1, e0, e1, de0, dde0)
    assert len(c) == 4
    np.testing.assert_allclose(poly_d(c, phi0), e0, atol=1e-12)
    np.testing.assert_allclose(poly_d(c, phi1), e1, atol=1e-12)
    np.testing.assert_allclose(poly_d(c, phi0, 1), de0, atol=1e-12)
    np.testing.assert_allclose(poly_d(c, phi0, 2), dde0, atol=1e-12)


def test_golden_vs_reference_closed_form():
    """Golden values computed from the reference expanded coefficients
    (`mpc_utils_casadi.py:223-320`) at (0.3, 1.7, 0.05, 0.12, 0.4, 0.45)."""
    c = bounds.compute_bound_params(0.3, 1.7, 0.05, 0.12, 0.4, 0.45)
    golden = np.array(
        [0.93710954, -3.79945856, 4.57163682, -1.41833611, 0.15904831]
    )
    np.testing.assert_allclose(np.asarray(c), golden, atol=1e-9)


def test_eval_horner_vectorized():
    c = (2.0, -1.0, 0.5)
    phis = jnp.linspace(0.0, 1.0, 5)
    out = np.asarray(bounds.eval_bound_poly(phis, c))
    np.testing.assert_allclose(out, np.poly1d(c)(np.asarray(phis)), atol=1e-12)
