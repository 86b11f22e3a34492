"""Ideal-gas oracle self-consistency and the statistical beta-extrapolation
gates (reference tests/test_idealgas.py + test_beta.py:77-129)."""

import numpy as np
import pytest
import sympy as sp

import thermoextrap_tpu as xtpu
from thermoextrap_tpu import beta as beta_xpan
from thermoextrap_tpu import idealgas

BETA0 = 5.6
VOL = 1.0
ORDER = 6


class TestAnalytic:
    """Series-algebra derivatives vs direct sympy differentiation."""

    @pytest.mark.parametrize("k", range(ORDER + 1))
    def test_dbeta_xave(self, k):
        b, L = sp.symbols("b L")
        xave = 1 / b - L / (sp.exp(b * L) - 1)
        expected = float(
            sp.diff(xave, b, k).subs({b: sp.Rational(28, 5), L: 1}).evalf(30)
        )
        got = float(idealgas.dbeta_xave(k)(BETA0, VOL))
        np.testing.assert_allclose(got, expected, rtol=1e-9)

    @pytest.mark.parametrize("k", [0, 1, 3, 6])
    def test_dbeta_xave_minuslog(self, k):
        b, L = sp.symbols("b L")
        xave = 1 / b - L / (sp.exp(b * L) - 1)
        expected = float(
            sp.diff(-sp.log(xave), b, k).subs({b: sp.Rational(28, 5), L: 1}).evalf(30)
        )
        got = float(idealgas.dbeta_xave_minuslog(k)(BETA0, VOL))
        np.testing.assert_allclose(got, expected, rtol=1e-8)

    @pytest.mark.parametrize("k", [0, 1, 4])
    def test_dbeta_xave_depend(self, k):
        b, L = sp.symbols("b L")
        xave = b * (1 / b - L / (sp.exp(b * L) - 1))
        expected = float(
            sp.diff(xave, b, k).subs({b: sp.Rational(28, 5), L: 1}).evalf(30)
        )
        got = float(idealgas.dbeta_xave_depend(k)(BETA0, VOL))
        np.testing.assert_allclose(got, expected, rtol=1e-9)

    @pytest.mark.parametrize("k", [0, 1, 3])
    def test_dvol_xave(self, k):
        b, L = sp.symbols("b L")
        xave = 1 / b - L / (sp.exp(b * L) - 1)
        expected = float(
            sp.diff(xave, L, k).subs({b: 1, L: sp.Rational(3, 2)}).evalf(30)
        )
        got = float(idealgas.dvol_xave(k)(1.0, 1.5))
        np.testing.assert_allclose(got, expected, rtol=1e-8)

    def test_x_ave_x_var(self):
        # moments of the truncated exponential distribution by quadrature
        from scipy.integrate import quad

        pdf = lambda x: float(idealgas.x_prob(x, BETA0, VOL))
        m1 = quad(lambda x: x * pdf(x), 0, VOL)[0]
        m2 = quad(lambda x: x * x * pdf(x), 0, VOL)[0]
        np.testing.assert_allclose(float(idealgas.x_ave(BETA0, VOL)), m1, rtol=1e-8)
        np.testing.assert_allclose(
            float(idealgas.x_var(BETA0, VOL)), m2 - m1**2, rtol=1e-7
        )

    def test_sampling_matches_cdf(self):
        xs = np.asarray(idealgas.x_sample((200_000,), BETA0, VOL, rng=3))
        # Kolmogorov-Smirnov style check on the analytic CDF
        grid = np.linspace(0.05, 0.95, 10)
        emp = np.array([(xs <= g).mean() for g in grid])
        ana = np.array([float(idealgas.x_cdf(g, BETA0, VOL)) for g in grid])
        np.testing.assert_allclose(emp, ana, atol=5e-3)


class TestStatisticalExtrapolation:
    """Sampled IG data: derivatives/extrapolation within bootstrap CI of the
    analytic answer (reference test_beta.py:77-129: 5x CI for derivatives,
    2x CI for the extrapolation)."""

    NSAMP, NPART, NREP = 100_000, 1_000, 100

    @pytest.fixture(scope="class", params=[False, True], ids=["raw", "central"])
    def model_and_boot(self, request):
        central = request.param
        x, u = idealgas.generate_data((self.NSAMP, self.NPART), BETA0, VOL, rng=42)
        data = xtpu.factory_data_values(
            uv=np.asarray(u), xv=np.asarray(x), order=ORDER, central=central
        )
        model = beta_xpan.factory_extrapmodel(BETA0, data)
        boot = model.resample({"nrep": self.NREP})
        return model, boot

    def test_derivatives_within_ci(self, model_and_boot):
        model, boot = model_and_boot
        derivs = np.asarray(model.derivs())
        bderivs = np.asarray(boot.derivs())  # (order+1, nrep)
        std = bderivs.std(axis=1)
        exact = np.array(
            [float(idealgas.dbeta_xave(k)(BETA0, VOL)) for k in range(ORDER + 1)]
        )
        assert np.all(np.abs(derivs - exact) < 5 * std + 1e-12)

    def test_extrapolation_within_ci(self, model_and_boot):
        model, boot = model_and_boot
        betas = np.array([BETA0 - 0.4, BETA0 + 0.4])
        pred = np.asarray(model.predict(betas))
        bpred = np.asarray(boot.predict(betas))  # (A, nrep)
        std = bpred.std(axis=1)
        exact = np.array(
            [idealgas.x_beta_extrap(ORDER, BETA0, b, VOL)[0] for b in betas]
        )
        # ratio estimators carry O(1/N) bias, so allow 5x the bootstrap CI
        # (reference gate: 2-5x, test_beta.py:100-128)
        assert np.all(np.abs(pred - exact) < 5 * std + 1e-12)


class TestMinusLogStatistical:
    def test_minus_log_extrapolation(self):
        x, u = idealgas.generate_data((50_000, 1_000), BETA0, VOL, rng=1)
        data = xtpu.factory_data_values(
            uv=np.asarray(u), xv=np.asarray(x), order=4, central=True
        )
        model = beta_xpan.factory_extrapmodel(BETA0, data, minus_log=True)
        b = BETA0 + 0.3
        pred = float(np.asarray(model.predict(b)))
        exact = float(idealgas.x_beta_extrap_minuslog(4, BETA0, b, VOL)[0])
        boot = model.resample({"nrep": 60})
        std = float(np.asarray(boot.predict(b)).std())
        assert abs(pred - exact) < 5 * std + 1e-10
