"""Exact numpy-f64 oracles for the experimental noise-GP models.

Gates ``thermoextrap_tpu.gpr_active.experimental`` (TPU-native rebuild of
the reference's experimental models, /root/reference/src/thermoextrap/
gpr_active/gp_models.py:261-476): every closed-form quantity — stationary
kernels, plain-GPR marginal likelihood and posterior, the joint
Binois/Ankenman objective, noise prediction, and the likelihood densities
— is recomputed independently in plain numpy and matched tightly.
"""

import math

import numpy as np
import pytest
from scipy.linalg import cho_solve, cholesky, solve_triangular

from thermoextrap_tpu.gpr_active.experimental import (
    _JITTER,
    FullyHeteroscedasticGPR,
    HetGaussianNoiseGP,
    PlainGPR,
    StationaryKernel,
)

RNG = np.random.default_rng(1234)


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------


def oracle_kernel(kind, x1, x2, var, ls):
    d = (x1[:, None, :] - x2[None, :, :]) / np.asarray(ls)
    r2 = (d**2).sum(-1)
    if kind == "rbf":
        return var * np.exp(-0.5 * r2)
    r = np.sqrt(r2)
    s5 = math.sqrt(5.0)
    return var * (1.0 + s5 * r + 5.0 * r2 / 3.0) * np.exp(-s5 * r)


def oracle_mvn_ld(y, mu, chol_lower):
    a = solve_triangular(chol_lower, y - mu, lower=True)
    n, d = y.shape
    return (
        -0.5 * (a**2).sum()
        - 0.5 * n * d * math.log(2.0 * math.pi)
        - d * np.log(np.diag(chol_lower)).sum()
    )


def oracle_gauss_ld(x, mu, var):
    return -0.5 * (math.log(2.0 * math.pi) + np.log(var) + (x - mu) ** 2 / var)


def oracle_gpr(x, y, xnew, kind, var, ls, sigma2):
    """Zero-mean exact GPR: (lml, posterior mean, posterior diag var)."""
    k = oracle_kernel(kind, x, x, var, ls)
    L = cholesky(k + (sigma2 + _JITTER) * np.eye(len(x)), lower=True)
    lml = oracle_mvn_ld(y, 0.0, L)
    kmn = oracle_kernel(kind, x, xnew, var, ls)
    a = solve_triangular(L, kmn, lower=True)
    b = solve_triangular(L, y, lower=True)
    mean = a.T @ b
    vdiag = np.diag(oracle_kernel(kind, xnew, xnew, var, ls)) - (a**2).sum(0)
    return lml, mean, vdiag[:, None]


def make_het_data(n=14, d=1):
    """Synthetic heteroscedastic dataset in the reference's 3-column layout."""
    x = np.sort(RNG.uniform(0.0, 3.0, size=(n, d)), axis=0)
    true_noise = 0.05 + 0.4 * np.sin(0.8 * x[:, :1]) ** 2  # per-config variance
    nsamp = RNG.integers(50, 200, size=(n, 1)).astype(float)
    f = np.cos(1.3 * x[:, :1])
    yval = f + RNG.normal(size=(n, 1)) * np.sqrt(true_noise / nsamp)
    # "measured" variance of the mean, noisy around truth
    yvar = (true_noise / nsamp) * RNG.uniform(0.8, 1.25, size=(n, 1))
    return x, np.concatenate([yval, yvar, nsamp], axis=1), true_noise


# ---------------------------------------------------------------------------
# stationary kernels
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kind", ["rbf", "matern52"])
@pytest.mark.parametrize("dims", [1, 3])
def test_stationary_kernel_matches_oracle(kind, dims):
    ls = RNG.uniform(0.5, 2.0, size=dims)
    kern = StationaryKernel(dims, kind, variance=1.7, lengthscales=ls)
    x1 = RNG.normal(size=(9, dims))
    x2 = RNG.normal(size=(7, dims))
    np.testing.assert_allclose(
        np.asarray(kern(x1, x2)),
        oracle_kernel(kind, x1, x2, 1.7, ls),
        rtol=1e-10,
        atol=1e-12,
    )
    # symmetry + unit diagonal scaling at zero distance
    k11 = np.asarray(kern(x1))
    np.testing.assert_allclose(k11, k11.T, rtol=1e-12)
    np.testing.assert_allclose(np.diag(k11), 1.7, rtol=1e-9)


def test_stationary_kernel_rejects_unknown_kind():
    with pytest.raises(ValueError, match="kind"):
        StationaryKernel(1, "cauchy")


# ---------------------------------------------------------------------------
# PlainGPR (the inner noise model)
# ---------------------------------------------------------------------------


class TestPlainGPR:
    def setup_method(self):
        self.x = np.linspace(0.0, 2.0, 11)[:, None]
        self.y = np.sin(2.0 * self.x) + 0.05 * RNG.normal(size=(11, 1))
        self.kern = StationaryKernel(1, "matern52", variance=1.3, lengthscales=0.8)
        self.gp = PlainGPR((self.x, self.y), self.kern, noise_variance=0.04)

    def test_lml_matches_oracle(self):
        lml, _, _ = oracle_gpr(self.x, self.y, self.x, "matern52", 1.3, 0.8, 0.04)
        np.testing.assert_allclose(
            float(self.gp.log_marginal_likelihood()), lml, rtol=1e-9
        )

    def test_predict_matches_oracle(self):
        xnew = np.linspace(-0.3, 2.3, 17)[:, None]
        _, mean, vdiag = oracle_gpr(self.x, self.y, xnew, "matern52", 1.3, 0.8, 0.04)
        m, v = self.gp.predict_f(xnew)
        np.testing.assert_allclose(np.asarray(m), mean, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(v), vdiag, rtol=1e-7, atol=1e-10)
        # full_cov diagonal agrees with the diagonal path
        m2, vfull = self.gp.predict_f(xnew, full_cov=True)
        np.testing.assert_allclose(np.asarray(m2), mean, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(
            np.diag(np.asarray(vfull))[:, None], vdiag, rtol=1e-7, atol=1e-10
        )

    def test_train_improves_and_roundtrips(self, tmp_path):
        neg0 = float(self.gp.neg_lml(self.gp.get_unconstrained()))
        self.gp.train(max_iter=60)
        neg1 = float(self.gp.neg_lml(self.gp.get_unconstrained()))
        assert neg1 <= neg0 + 1e-9
        p = self.gp.parameters()
        assert all(np.isfinite(v) and v > 0 for v in p.values())
        self.gp.save_params(tmp_path / "p.json")
        self.gp.set_parameters({k: v * 2.0 for k, v in p.items()})
        self.gp.load_params(tmp_path / "p.json")
        assert self.gp.parameters() == pytest.approx(p)


# ---------------------------------------------------------------------------
# HetGaussianNoiseGP likelihood formulas
# ---------------------------------------------------------------------------


class TestHetGaussianNoiseGP:
    def setup_method(self):
        self.x = np.linspace(0.0, 1.0, 8)[:, None]
        self.z = RNG.normal(size=(8, 1))
        self.lik = HetGaussianNoiseGP((self.x, self.z))
        self.lik.noise_gp.likelihood_variance.value = 0.07
        self.F = np.stack(
            [RNG.normal(size=6), RNG.uniform(0.1, 0.5, size=6)], axis=1
        )
        self.Fvar = RNG.uniform(0.01, 0.1, size=(6, 2))
        self.Y = np.stack(
            [RNG.normal(size=6), RNG.uniform(0.05, 0.6, size=6)], axis=1
        )

    def test_default_inner_kernel_is_matern52(self):
        assert self.lik.noise_gp.kernel.kind == "matern52"

    def test_scalar_log_prob(self):
        got = np.asarray(self.lik.scalar_log_prob(self.F, self.Y))
        want = oracle_gauss_ld(
            self.Y[:, :1], self.F[:, :1], self.F[:, 1:]
        ) + oracle_gauss_ld(np.log(self.Y[:, 1:]), np.log(self.F[:, 1:]), 0.07)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_conditional_moments(self):
        np.testing.assert_allclose(
            np.asarray(self.lik.conditional_mean(self.F)), self.F[:, :1]
        )
        np.testing.assert_allclose(
            np.asarray(self.lik.conditional_variance(self.F)), self.F[:, 1:]
        )

    def test_predict_mean_and_var(self):
        m, v = self.lik.predict_mean_and_var(self.F, self.Fvar)
        np.testing.assert_allclose(np.asarray(m), self.F[:, :1])
        np.testing.assert_allclose(
            np.asarray(v), self.Fvar[:, :1] + self.F[:, 1:], rtol=1e-12
        )

    def test_predict_log_density(self):
        got = np.asarray(self.lik.predict_log_density(self.F, self.Fvar, self.Y))
        want = oracle_gauss_ld(
            self.Y[:, :1], self.F[:, :1], self.Fvar[:, :1] + self.F[:, 1:]
        ).sum(-1) + oracle_gauss_ld(
            np.log(self.Y[:, 1:]), np.log(self.F[:, 1:]), self.Fvar[:, 1:]
        ).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_variational_expectations(self):
        got = np.asarray(
            self.lik.variational_expectations(self.F, self.Fvar, self.Y)
        )
        l2p = math.log(2.0 * math.pi)
        want = (
            -0.5 * l2p
            - 0.5 * np.log(self.F[:, 1:])
            - 0.5
            * ((self.Y[:, :1] - self.F[:, :1]) ** 2 + self.Fvar[:, :1])
            / self.F[:, 1:]
        ).sum(-1) + (
            -0.5 * l2p
            - 0.5 * math.log(0.07)
            - 0.5
            * ((self.Y[:, 1:] - np.log(self.F[:, 1:])) ** 2 + self.Fvar[:, 1:])
            / 0.07
        ).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-12)


# ---------------------------------------------------------------------------
# FullyHeteroscedasticGPR
# ---------------------------------------------------------------------------


class TestFullyHeteroscedasticGPR:
    def setup_method(self):
        self.x, self.y3, self.true_noise = make_het_data()
        self.kern = StationaryKernel(1, "rbf", variance=1.1, lengthscales=0.9)
        self.nkern = StationaryKernel(1, "matern52", variance=0.8, lengthscales=1.2)
        self.model = FullyHeteroscedasticGPR(
            (self.x, self.y3), self.kern, noise_kernel=self.nkern
        )
        self.model.likelihood.noise_gp.likelihood_variance.value = 0.15

    def _oracle_pieces(self):
        x, y3 = self.x, self.y3
        z = np.log(y3[:, 1:2] * y3[:, 2:3])
        n = y3[:, -1]
        kn = oracle_kernel("matern52", x, x, 0.8, 1.2)
        Ln = cholesky(kn + (0.15 + _JITTER) * np.eye(len(x)), lower=True)
        lml_inner = oracle_mvn_ld(z, 0.0, Ln)
        log_s = kn @ cho_solve((Ln, True), z)
        s_diag = np.exp(log_s[:, 0]) / n
        k = oracle_kernel("rbf", x, x, 1.1, 0.9)
        L = cholesky(k + np.diag(s_diag + _JITTER), lower=True)
        lml_outer = oracle_mvn_ld(y3[:, :1], 0.0, L)
        return z, n, s_diag, L, Ln, lml_outer, lml_inner

    def test_rejects_bad_y_shape(self):
        with pytest.raises(ValueError, match="N, 3"):
            FullyHeteroscedasticGPR((self.x, self.y3[:, :2]), self.kern)

    def test_joint_lml_matches_oracle(self):
        *_, lml_outer, lml_inner = self._oracle_pieces()
        np.testing.assert_allclose(
            float(self.model.log_marginal_likelihood()),
            lml_outer + lml_inner,
            rtol=1e-9,
        )
        np.testing.assert_allclose(
            float(self.model.maximum_log_likelihood_objective()),
            lml_outer + lml_inner,
            rtol=1e-9,
        )

    def test_predict_noise_matches_oracle(self):
        z, *_ = self._oracle_pieces()
        xnew = np.linspace(0.2, 2.8, 9)[:, None]
        _, mean, vdiag = oracle_gpr(self.x, z, xnew, "matern52", 0.8, 1.2, 0.15)
        noise, logvar = self.model.predict_noise(xnew)
        np.testing.assert_allclose(np.asarray(noise), np.exp(mean), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(logvar), vdiag, rtol=1e-7, atol=1e-10)

    def test_predict_f_matches_oracle(self):
        _, _, s_diag, L, *_ = self._oracle_pieces()
        xnew = np.linspace(0.0, 3.0, 13)[:, None]
        kmn = oracle_kernel("rbf", self.x, xnew, 1.1, 0.9)
        a = solve_triangular(L, kmn, lower=True)
        b = solve_triangular(L, self.y3[:, :1], lower=True)
        mean = a.T @ b
        vdiag = np.diag(oracle_kernel("rbf", xnew, xnew, 1.1, 0.9)) - (a**2).sum(0)
        m, v = self.model.predict_f(xnew)
        np.testing.assert_allclose(np.asarray(m), mean, rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(np.asarray(v), vdiag[:, None], rtol=1e-7, atol=1e-10)
        # full covariance: diagonal agrees
        m2, vfull = self.model.predict_f(xnew, full_cov=True)
        np.testing.assert_allclose(np.asarray(m2), mean, rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(
            np.diag(np.asarray(vfull)), vdiag, rtol=1e-7, atol=1e-10
        )

    def test_predict_y_composition(self):
        xnew = np.linspace(0.5, 2.5, 5)[:, None]
        f_mean, f_var = self.model.predict_f(xnew)
        noise, _ = self.model.predict_noise(xnew)
        m, v = self.model.predict_y(xnew)
        np.testing.assert_allclose(np.asarray(m), np.asarray(f_mean), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(v),
            np.asarray(f_var) + np.asarray(noise) / self.model.min_samps,
            rtol=1e-10,
        )

    def test_predict_log_density_is_finite_and_oracle_consistent(self):
        ld = np.asarray(self.model.predict_log_density((self.x, self.y3)))
        assert ld.shape == (len(self.x),)
        assert np.all(np.isfinite(ld))
        # oracle recomposition from predict_f / predict_noise
        f_mean, f_var = self.model.predict_f(self.x)
        noise, noise_var = self.model.predict_noise(self.x)
        yobs = self.y3[:, 1:2] * self.y3[:, 2:3]
        want = oracle_gauss_ld(
            self.y3[:, :1], np.asarray(f_mean), np.asarray(f_var) + np.asarray(noise)
        ).sum(-1) + oracle_gauss_ld(
            np.log(yobs), np.log(np.asarray(noise)), np.asarray(noise_var)
        ).sum(-1)
        np.testing.assert_allclose(ld, want, rtol=1e-9)

    def test_joint_training_improves_and_learns_noise_field(self):
        neg0 = float(self.model.neg_lml(self.model.get_unconstrained()))
        self.model.train(max_iter=120)
        neg1 = float(self.model.neg_lml(self.model.get_unconstrained()))
        assert neg1 <= neg0 + 1e-9
        assert all(np.isfinite(v) for v in self.model.parameters().values())
        # the learned per-config noise field tracks the true one: positive
        # correlation across training inputs (the field varies ~9x here)
        noise, _ = self.model.predict_noise(self.x)
        c = np.corrcoef(np.log(np.asarray(noise)[:, 0]), np.log(self.true_noise[:, 0]))
        assert c[0, 1] > 0.5

    def test_mean_function_is_applied(self):
        const = lambda X: np.full((np.asarray(X).shape[0], 1), 2.5)  # noqa: E731
        m = FullyHeteroscedasticGPR(
            (self.x, self.y3),
            StationaryKernel(1, "rbf", variance=1.1, lengthscales=0.9),
            mean_function=const,
            noise_kernel=StationaryKernel(1, "matern52", variance=0.8, lengthscales=1.2),
        )
        far = np.array([[40.0]])  # far from data: posterior falls back to mean
        mean, _ = m.predict_f(far)
        np.testing.assert_allclose(float(mean[0, 0]), 2.5, atol=1e-6)
