"""Observable-identity tests (reference tests/test_u_equations.py:55-88 and
test_lnPi.py:15-21 role): different observable constructions that are
mathematically identical must produce identical derivatives."""

import numpy as np
import pytest

import thermoextrap_tpu as xtpu
from thermoextrap_tpu import beta as beta_xpan
from thermoextrap_tpu import lnpi as lnpi_xpan

ORDER = 5
BETA0 = 1.1


@pytest.fixture(scope="module")
def uval():
    rng = np.random.default_rng(21)
    return rng.normal(2.0, 0.8, 300)


@pytest.fixture(scope="module")
def xval(uval):
    rng = np.random.default_rng(22)
    return rng.normal(1.0, 0.3, uval.shape[0])


def _derivs(model, order=None):
    return np.asarray(model.derivs(order=order))


def test_xun_n0_equals_x_ave(uval, xval):
    """<x u^0> == <x> (xun_ave with n=0 reduces to x_ave)."""
    data = xtpu.factory_data_values(uv=uval, xv=xval, order=ORDER, central=False)
    m_x = beta_xpan.factory_extrapmodel(BETA0, data, name="x_ave")
    m_xu0 = beta_xpan.factory_extrapmodel(
        BETA0, data, name="xun_ave", n=0, order=ORDER
    )
    np.testing.assert_allclose(
        _derivs(m_x), _derivs(m_xu0), rtol=1e-10
    )


def test_un_n1_equals_u_ave(uval):
    """<u^1> == <u> (un_ave with n=1 reduces to u_ave)."""
    data = xtpu.factory_data_values(
        uv=uval, xv=None, order=ORDER + 1, central=False, x_is_u=True
    )
    m_u = beta_xpan.factory_extrapmodel(BETA0, data, name="u_ave", order=ORDER)
    m_u1 = beta_xpan.factory_extrapmodel(
        BETA0, data, name="un_ave", n=1, order=ORDER
    )
    np.testing.assert_allclose(
        _derivs(m_u, ORDER), _derivs(m_u1, ORDER), rtol=1e-10
    )


@pytest.mark.parametrize("central", [False, True])
def test_lnpi_deriv_is_minus_u_ave(uval, central):
    """(lnPi)^(k+1) == -<u>^(k) for k >= 1 (reference test_lnPi.py:15-21:
    u_ave.exprs[i] + lnpi.exprs[i+1] == 0; the mu*N term only enters at
    first order)."""
    data = xtpu.factory_data_values(
        uv=uval, xv=None, order=ORDER, central=central, x_is_u=True,
        meta=lnpi_xpan.lnPiDataCallback.from_mu(
            lnPi0=np.zeros(()), mu=[0.7], ncoords=np.ones((1,))
        ),
    )
    m_lnpi = lnpi_xpan.factory_extrapmodel_lnPi(BETA0, data)
    d_lnpi = _derivs(m_lnpi)  # order: 0..ORDER+1

    data_u = xtpu.factory_data_values(
        uv=uval, xv=None, order=ORDER, central=central, x_is_u=True
    )
    m_u = beta_xpan.factory_extrapmodel(BETA0, data_u, name="u_ave", order=ORDER)
    d_u = _derivs(m_u, ORDER)

    np.testing.assert_allclose(d_lnpi[2:], -d_u[1:], rtol=1e-9)
    # first order includes the mu.N coupling
    np.testing.assert_allclose(d_lnpi[1], 0.7 - d_u[0], rtol=1e-9)


@pytest.mark.parametrize("central", [False, True])
def test_dxdun_n1_matches_cov_derivative(uval, xval, central):
    """d<x>/dbeta == -<dx du> : the first x_ave derivative equals minus the
    dxdun_ave(n=1) value at order 0 (fluctuation identity)."""
    if not central:
        pytest.skip("dxdun_ave is central-only (reference beta.py:336-343)")
    data = xtpu.factory_data_values(uv=uval, xv=xval, order=ORDER, central=True)
    m_x = beta_xpan.factory_extrapmodel(BETA0, data, name="x_ave")
    m_dxdu = beta_xpan.factory_extrapmodel(
        BETA0, data, name="dxdun_ave", n=1, order=ORDER - 2
    )
    np.testing.assert_allclose(
        _derivs(m_x)[1], -_derivs(m_dxdu, 0)[0], rtol=1e-10
    )


def test_pow_post_func(uval, xval):
    """pow_2 post-transform == square of the x_ave series."""
    from thermoextrap_tpu.ops.series import series_mul

    data = xtpu.factory_data_values(uv=uval, xv=xval, order=4, central=True)
    m = beta_xpan.factory_extrapmodel(BETA0, data, name="x_ave")
    m_sq = beta_xpan.factory_extrapmodel(
        BETA0, data, name="x_ave", post_func="pow_2",
        derivatives=beta_xpan.factory_derivatives(
            "x_ave", central=True, post_func="pow_2"
        ),
    )
    c = m.coefs()
    expected = np.asarray(series_mul(c, c, order=4))
    np.testing.assert_allclose(np.asarray(m_sq.coefs()), expected, rtol=1e-10)


def test_from_sympy_migration_seam(uval, xval):
    """User-supplied sympy expressions (reference Derivatives.from_sympy,
    models.py:404-421) must reproduce the native engine: build the x_ave
    derivative expressions by symbolic series division and compare."""
    import sympy as sp

    from thermoextrap_tpu.models.derivatives import Derivatives

    order = 4
    u_sym = sp.IndexedBase("u")
    xu_sym = sp.IndexedBase("xu")

    # symbolic truncated-series division of <x e^{-D u}> / <e^{-D u}>
    fact = [sp.factorial(n) for n in range(order + 1)]
    a = [(-1) ** n * xu_sym[n] / fact[n] for n in range(order + 1)]
    b = [(-1) ** n * u_sym[n] / fact[n] for n in range(order + 1)]
    c = []
    for n in range(order + 1):
        val = a[n] - sum(b[k] * c[n - k] for k in range(1, n + 1))
        c.append(sp.expand(val / b[0]))
    exprs = [sp.expand(c[n] * fact[n]) for n in range(order + 1)]

    derivs = Derivatives.from_sympy(exprs, args=(u_sym, xu_sym))

    data = xtpu.factory_data_values(uv=uval, xv=xval, order=order, central=False)
    m_sympy = xtpu.ExtrapModel(BETA0, data, derivs, order=order)
    m_native = beta_xpan.factory_extrapmodel(BETA0, data, name="x_ave")
    np.testing.assert_allclose(
        np.asarray(m_sympy.derivs()), np.asarray(m_native.derivs()), rtol=1e-10
    )
    # and predictions flow through the same ExtrapModel machinery
    np.testing.assert_allclose(
        np.asarray(m_sympy.predict(1.3)),
        np.asarray(m_native.predict(1.3)),
        rtol=1e-10,
    )


def test_end_to_end_differentiability(uval, xval):
    """The full pipeline samples -> moments -> series engine -> prediction is
    differentiable (a capability the reference stack cannot offer): gradient
    of the extrapolated prediction w.r.t. each raw sample matches finite
    differences."""
    import jax
    import jax.numpy as jnp

    from thermoextrap_tpu.models.derivatives import central_x_ave_coefs
    from thermoextrap_tpu.ops.moments import reduce_central_comoments

    order, b_eval = 3, BETA0 + 0.2
    xv = xval[:50]
    uv = uval[:50]

    def predict(u_samples):
        xave, _ua, du, dxdu = reduce_central_comoments(
            u_samples, jnp.asarray(xv)[:, None], order
        )
        c = central_x_ave_coefs(xave, du[:, None], dxdu, order)
        d = b_eval - BETA0
        return sum(c[n, 0] * d**n for n in range(order + 1))

    g = jax.grad(predict)(jnp.asarray(uval[:50]))
    # finite-difference check on a few sample positions
    h = 1e-6
    for i in (0, 17, 42):
        up = np.array(uval[:50]); up[i] += h
        um = np.array(uval[:50]); um[i] -= h
        fd = (float(predict(jnp.asarray(up))) - float(predict(jnp.asarray(um)))) / (2 * h)
        np.testing.assert_allclose(float(g[i]), fd, rtol=1e-5, atol=1e-10)
