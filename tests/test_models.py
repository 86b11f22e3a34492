"""Model-layer tests: interpolation exactness properties, weighted blends,
perturbation reweighting, MBAR (reference tests/test_beta.py:165-487 role)."""

import math

import numpy as np
import pytest

import thermoextrap_tpu as xtpu
from thermoextrap_tpu import beta as beta_xpan
from thermoextrap_tpu.models.extrap import (
    ExtrapWeightedModel,
    InterpModel,
    InterpModelPiecewise,
    MBARModel,
)

ORDER = 3


def make_state(beta0, seed, n=80):
    rng = np.random.default_rng(seed)
    u = rng.normal(loc=2.0, size=n)
    x = rng.normal(loc=1.0 + beta0, size=(n, 2))
    data = xtpu.DataValuesCentral.from_vals(x, u, ORDER)
    return beta_xpan.factory_extrapmodel(beta0, data)


@pytest.fixture(scope="module")
def states():
    return [make_state(b, s) for b, s in [(0.5, 0), (1.0, 1), (1.5, 2)]]


class TestInterpModel:
    def test_hermite_property(self, states):
        """The joint polynomial must reproduce each state's derivatives at
        its own alpha0 (defining property of the linear system,
        reference models.py:858-914)."""
        interp = InterpModel(states[:2])
        coefs = np.asarray(interp.coefs())  # (porder+1, val)
        porder = coefs.shape[0] - 1

        for m in states[:2]:
            derivs = np.asarray(m.derivs())
            a = m.alpha0
            for j in range(ORDER + 1):
                # p^(j)(a) = sum_p coefs[p] * p!/(p-j)! * a^(p-j)
                val = sum(
                    coefs[p] * math.factorial(p) / math.factorial(p - j) * a ** (p - j)
                    for p in range(j, porder + 1)
                )
                np.testing.assert_allclose(val, derivs[j], rtol=1e-7, atol=1e-10)

    def test_polynomial_recovery(self):
        """From data whose <x>(beta) is an exact cubic, interp through two
        states recovers the polynomial (reference test_beta.py:431-453)."""
        # discrete ensemble => exact <x>(beta); instead simpler: use states
        # whose derivatives are set from a known polynomial via custom data.
        poly = np.array([0.3, -0.2, 0.5, 1.0])  # c0 + c1 b + c2 b^2 + c3 b^3

        class FakeData:
            def __init__(self, beta0):
                self.order = 1
                self.beta0 = beta0
                self.derivs_args = (beta0,)

        from thermoextrap_tpu.models.derivatives import Derivatives

        def coef_fn(args, order):
            import jax.numpy as jnp

            (b0,) = args
            derivs = []
            for j in range(order + 1):
                v = sum(
                    poly[p] * math.factorial(p) / math.factorial(p - j) * b0 ** (p - j)
                    for p in range(j, 4)
                )
                derivs.append(jnp.asarray(v) / math.factorial(j))
            return jnp.stack(derivs)

        dfuncs = Derivatives(coefs_fn=coef_fn, name="poly")
        ms = [
            xtpu.ExtrapModel(b0, FakeData(b0), dfuncs, order=1)
            for b0 in (0.5, 1.5)
        ]
        interp = InterpModel(ms)
        got = np.asarray(interp.coefs())
        np.testing.assert_allclose(got, poly, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(interp.predict(2.0)),
            np.polyval(poly[::-1], 2.0),
            rtol=1e-10,
        )

    def test_piecewise_matches_pair(self, states):
        pw = InterpModelPiecewise(states)
        pair = InterpModel(states[0:2])
        a = 0.75
        np.testing.assert_allclose(
            np.asarray(pw.predict(a)), np.asarray(pair.predict(a)), rtol=1e-10
        )
        # vector alpha spanning both segments works
        out = np.asarray(pw.predict(np.array([0.6, 1.2])))
        assert out.shape == (2, 2)


class TestExtrapWeighted:
    def test_endpoint_equals_state(self, states):
        ew = ExtrapWeightedModel(states[:2])
        a = states[0].alpha0
        np.testing.assert_allclose(
            np.asarray(ew.predict(a)),
            np.asarray(states[0].predict(a)),
            rtol=1e-10,
        )

    def test_multi_state_selection(self, states):
        ew = ExtrapWeightedModel(states)
        out = np.asarray(ew.predict(np.array([0.7, 1.3])))
        assert out.shape == (2, 2)
        # between states 1 and 2 only those two should matter
        pair = ExtrapWeightedModel(states[1:])
        np.testing.assert_allclose(
            out[1], np.asarray(pair.predict(1.3)), rtol=1e-10
        )

    def test_minkowski_weights_no_f32_underflow(self):
        """delta**20 underflows to 0 below |delta| ~ 0.006 in f32 (the TPU
        production dtype), which made closely spaced bracketing states
        produce NaN weights; the scale-invariant normalized form must not."""
        import jax.numpy as jnp

        from thermoextrap_tpu.models.extrap import xr_weights_minkowski

        w = np.asarray(
            xr_weights_minkowski(jnp.asarray([0.004, 0.006], jnp.float32))
        )
        assert np.all(np.isfinite(w))
        ref = np.asarray(
            xr_weights_minkowski(np.array([0.004, 0.006], np.float64))
        )
        np.testing.assert_allclose(w, ref, rtol=1e-4)
        # degenerate all-zero deltas: equal weights, still finite
        w0 = np.asarray(
            xr_weights_minkowski(jnp.asarray([0.0, 0.0], jnp.float32))
        )
        np.testing.assert_allclose(w0, [0.5, 0.5])


class TestPerturb:
    def test_exact_discrete(self):
        rng = np.random.default_rng(4)
        u = rng.uniform(0.5, 2.0, size=50)
        x = rng.uniform(0.0, 1.0, size=(50, 1))
        model = beta_xpan.factory_perturbmodel(1.0, u, x)
        betas = np.array([0.8, 1.0, 1.7])
        got = np.asarray(model.predict(betas))
        for i, b in enumerate(betas):
            w = np.exp(-(b - 1.0) * u)
            expected = (w[:, None] * x).sum(0) / w.sum()
            np.testing.assert_allclose(got[i], expected, rtol=1e-10)

    def test_scalar_alpha(self):
        rng = np.random.default_rng(4)
        u = rng.uniform(0.5, 2.0, size=20)
        x = rng.uniform(size=(20, 1))
        model = beta_xpan.factory_perturbmodel(1.0, u, x)
        assert np.asarray(model.predict(1.1)).shape == (1,)


class TestStateCollection:
    def test_basic_api(self, states):
        sc = xtpu.StateCollection(states)
        assert len(sc) == 3
        assert sc.order == ORDER
        assert sc.alpha0 == [0.5, 1.0, 1.5]
        appended = sc.append([make_state(0.75, 9)])
        assert [m.alpha0 for m in appended] == [0.5, 0.75, 1.0, 1.5]
        with pytest.raises(ValueError):
            sc._check_alpha(2.0, bounded=True)

    def test_resample(self, states):
        sc = xtpu.StateCollection(states)
        rs = sc.resample({"nrep": 4})
        pred = np.asarray(rs[0].predict(0.6))
        assert pred.shape == (4, 2)

    def test_map_concat(self, states):
        """map_concat stacks per-state results along a new leading axis in
        ``alpha0`` order (reference models.py:658-672 xr.concat analogue)."""
        sc = xtpu.StateCollection(states)
        out = sc.map_concat("predict", 0.8)
        assert out.shape == (3, 2)
        np.testing.assert_allclose(
            np.asarray(out),
            np.stack([np.asarray(s.predict(0.8)) for s in sc]),
        )
        # callables work too
        out2 = sc.map_concat(lambda s: s.predict(0.8))
        np.testing.assert_allclose(np.asarray(out2), np.asarray(out))


class TestStatisticalInefficiency:
    def test_cross_form(self):
        """Two-series (cross) statistical inefficiency: symmetric, ~1 for
        independent white series, and it catches slow CROSS correlation
        that both marginals miss (the reference's g(x, pot) term)."""
        from thermoextrap_tpu.models.mbar import statistical_inefficiency

        rng = np.random.default_rng(0)
        n = 6000
        # shared slow AR(1) component visible only via the cross term is
        # hard to build; instead check the standard properties:
        white1 = rng.normal(size=n)
        white2 = rng.normal(size=n)
        g12 = float(statistical_inefficiency(white1, white2))
        g21 = float(statistical_inefficiency(white2, white1))
        assert g12 == g21  # symmetric by construction
        assert g12 < 2.0  # independent: no common correlation

        # identical series: cross g == auto g
        g_auto = float(statistical_inefficiency(white1))
        g_same = float(statistical_inefficiency(white1, white1))
        np.testing.assert_allclose(g_same, g_auto, rtol=1e-10)

        # AR(1) pair driven by the SAME innovations: large cross g,
        # matching the marginal correlation time
        ar = np.empty(n)
        ar[0] = 0.0
        eps = rng.normal(size=n)
        for t in range(1, n):
            ar[t] = 0.9 * ar[t - 1] + eps[t]
        g_cross = float(statistical_inefficiency(ar, 0.5 * ar + 1.0))
        assert g_cross > 8.0  # (1+rho)/(1-rho) = 19 up to estimator noise

        # anticorrelated pair: normalization by a negative <dx dy> still
        # yields a finite, >= 1 result
        g_anti = float(statistical_inefficiency(ar, -ar))
        assert np.isfinite(g_anti) and g_anti >= 1.0


class TestMBAR:
    @pytest.mark.slow
    def test_ig_statistical(self):
        from thermoextrap_tpu import idealgas

        betas = [0.8, 1.2]
        states = []
        for i, b in enumerate(betas):
            x, u = idealgas.generate_data((2000, 10), b, rng=i)
            data = xtpu.DataValues.from_vals(
                np.asarray(x)[:, None], np.asarray(u), order=0, central=False
            )
            states.append(beta_xpan.factory_extrapmodel(b, data, order=0))
        mbar = MBARModel(states)
        got = np.asarray(mbar.predict(1.0))
        expected = float(idealgas.x_ave(1.0))
        assert abs(got[0] - expected) < 0.02

    def test_mbar_solver_two_state_exact(self):
        """Free-energy difference of two exactly-known Gaussian-ish states."""
        from thermoextrap_tpu.models.mbar import mbar_solve

        rng = np.random.default_rng(0)
        # state 0: u0(x); state 1: u1(x) = u0(x) + c  => f1 - f0 = c
        n = 400
        x0 = rng.normal(size=n)
        x1 = rng.normal(size=n)
        c = 1.7
        u_kn = np.stack(
            [
                0.5 * np.concatenate([x0, x1]) ** 2,
                0.5 * np.concatenate([x0, x1]) ** 2 + c,
            ]
        )
        f = np.asarray(mbar_solve(u_kn, np.array([n, n])))
        np.testing.assert_allclose(f[1] - f[0], c, rtol=1e-6)


def test_predict_fn_jittable(states):
    """predict_fn embeds a model's prediction in jitted programs."""
    import jax
    import jax.numpy as jnp

    from thermoextrap_tpu.models.extrap import predict_fn

    fn = predict_fn(states[0])
    alphas = jnp.array([0.6, 0.9])
    direct = np.asarray(states[0].predict(alphas))
    jitted = np.asarray(jax.jit(fn)(alphas))
    np.testing.assert_allclose(jitted, direct, rtol=1e-12)
    # and grad flows w.r.t. alpha
    g = jax.grad(lambda a: jnp.sum(fn(a)))(0.7)
    assert np.isfinite(float(g))
