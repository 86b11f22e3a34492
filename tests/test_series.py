"""Series (jet) algebra vs numpy polynomial arithmetic and sympy."""

import numpy as np
import pytest
import sympy as sp

from thermoextrap_tpu.ops import series as S


def np_series(expr, x, order):
    """Normalized Taylor coefficients of a sympy expr at x=0."""
    t = sp.symbols("t")
    ser = sp.series(expr, t, 0, order + 1).removeO()
    poly = sp.Poly(ser, t)
    return np.array(
        [float(poly.coeff_monomial(t**n)) for n in range(order + 1)]
    )


@pytest.fixture
def ab(rng_np):
    order = 6
    a = rng_np.normal(size=order + 1)
    b = rng_np.normal(size=order + 1)
    b[0] = 1.5  # invertible
    a[0] = 2.0  # log-able
    return a, b, order


def test_mul_div_roundtrip(ab):
    a, b, order = ab
    c = S.series_mul(a, b, order=order)
    a2 = S.series_div(c, b, order=order)
    np.testing.assert_allclose(np.asarray(a2), a, rtol=1e-12, atol=1e-12)


def test_div_vs_sympy(ab):
    a, b, order = ab
    t = sp.symbols("t")
    ea = sum(float(v) * t**n for n, v in enumerate(a))
    eb = sum(float(v) * t**n for n, v in enumerate(b))
    expected = np_series(sp.cancel(ea / eb), t, order)
    got = np.asarray(S.series_div(a, b, order=order))
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_pow_vs_mul(ab):
    a, _, order = ab
    p3 = S.series_pow(a, 3, order=order)
    ref = S.series_mul(S.series_mul(a, a, order=order), a, order=order)
    np.testing.assert_allclose(np.asarray(p3), np.asarray(ref), rtol=1e-12)


def test_pow_zero_and_neg(ab):
    a, _, order = ab
    p0 = np.asarray(S.series_pow(a, 0, order=order))
    np.testing.assert_allclose(p0, np.eye(order + 1)[0], atol=1e-15)
    pm1 = S.series_pow(a, -1, order=order)
    ident = S.series_mul(a, pm1, order=order)
    np.testing.assert_allclose(
        np.asarray(ident), np.eye(order + 1)[0], atol=1e-12
    )


def test_log_vs_sympy(ab):
    a, _, order = ab
    t = sp.symbols("t")
    ea = sum(float(v) * t**n for n, v in enumerate(a))
    expected = np_series(sp.log(ea), t, order)
    got = np.asarray(S.series_log(a, order=order))
    np.testing.assert_allclose(got, expected, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(S.series_neg_log(a, order=order)), -expected, rtol=1e-10
    )


def test_batched_broadcasting(rng_np):
    order = 5
    a = rng_np.normal(size=(order + 1, 3, 4))
    b = rng_np.normal(size=(order + 1, 3, 4))
    b[0] += 3.0
    c = S.series_div(a, b, order=order)
    for i in range(3):
        for j in range(4):
            cij = np.asarray(S.series_div(a[:, i, j], b[:, i, j], order=order))
            np.testing.assert_allclose(np.asarray(c[:, i, j]), cij, rtol=1e-12)


def test_derivs_coefs_roundtrip(rng_np):
    c = rng_np.normal(size=(7, 2))
    d = S.derivs_from_coefs(c)
    np.testing.assert_allclose(np.asarray(S.coefs_from_derivs(d)), c, rtol=1e-14)
    import math

    for n in range(7):
        np.testing.assert_allclose(
            np.asarray(d[n]), c[n] * math.factorial(n), rtol=1e-14
        )


def test_series_compose_linear_and_subsample():
    """Direct gates for the two public helpers with no other test path:
    coefficient rescale under Delta -> s*Delta, and decorrelated-subsample
    index strides (pymbar subsample_correlated_data role)."""
    import jax.numpy as jnp

    from thermoextrap_tpu.models.mbar import subsample_correlated_data
    from thermoextrap_tpu.ops.series import series_compose_linear

    # f(D) = 1 + 2D + 3D^2; f(sD) coefficients are c_n s^n
    c = jnp.asarray([1.0, 2.0, 3.0])
    got = np.asarray(series_compose_linear(c, 0.5))
    np.testing.assert_allclose(got, [1.0, 1.0, 0.75], rtol=1e-12)
    # batched coefficients rescale along the leading (moment) axis only
    cb = jnp.asarray([[1.0, 10.0], [2.0, 20.0]])
    gotb = np.asarray(series_compose_linear(cb, 2.0))
    np.testing.assert_allclose(gotb, [[1.0, 10.0], [4.0, 40.0]], rtol=1e-12)

    idx = subsample_correlated_data(np.zeros(100), g=9.2)
    np.testing.assert_array_equal(idx, np.arange(0, 100, 10))
    rng = np.random.default_rng(0)
    idx2 = subsample_correlated_data(rng.normal(size=500))  # iid: g ~ 1
    assert len(idx2) > 400
