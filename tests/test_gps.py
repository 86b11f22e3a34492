"""Derivative-kernel and heteroscedastic GPR tests
(reference tests/test_gps.py role: kernel derivative covariances checked
against independent numerics, likelihood vs scipy, full fit on noisy data)."""

import numpy as np
import pytest
import sympy as sp
from scipy import stats

from thermoextrap_tpu.gpr_active.gp_models import (
    ConstantMeanWithDerivs,
    DerivativeKernel,
    HeteroscedasticGPR,
    LinearWithDerivs,
    SympyMeanFunc,
    multioutput_multivariate_normal,
)
from thermoextrap_tpu.gpr_active.kernels import (
    RBFDerivKernel,
    make_matern_expr,
    make_poly_expr,
    make_rbf_expr,
)


def fd_mixed_partial(f, x1, x2, d1, d2, h=1e-4):
    """Finite-difference mixed partial d^{d1}_{x1} d^{d2}_{x2} f."""
    if d1 == 0 and d2 == 0:
        return f(x1, x2)
    if d1 > 0:
        return (
            fd_mixed_partial(f, x1 + h, x2, d1 - 1, d2, h)
            - fd_mixed_partial(f, x1 - h, x2, d1 - 1, d2, h)
        ) / (2 * h)
    return (
        fd_mixed_partial(f, x1, x2 + h, d1, d2 - 1, h)
        - fd_mixed_partial(f, x1, x2 - h, d1, d2 - 1, h)
    ) / (2 * h)


def rbf_deriv_closed_form(x1, x2, d1, d2, var, ell):
    r"""Exact mixed partial of the RBF kernel (independent oracle).

    With :math:`z = (x_1 - x_2)/\ell` and :math:`g(z) = e^{-z^2/2}`, the
    chain rule gives :math:`\partial_{x_1}^{d_1}\partial_{x_2}^{d_2} k =
    \mathrm{var}\,\ell^{-(d_1+d_2)} (-1)^{d_2} g^{(d_1+d_2)}(z)`, and the
    Gaussian derivative identity :math:`g^{(n)}(z) = (-1)^n He_n(z) g(z)`
    (probabilists' Hermite polynomials, :math:`He_{n+1} = z He_n - n
    He_{n-1}`) closes the form — the reference's hand-chained version is
    tests/test_gps.py:27-113; this derivation is exact to f64 roundoff at
    any order."""
    z = (x1 - x2) / ell
    n = d1 + d2
    he_prev, he = 1.0, z  # He_0, He_1
    if n == 0:
        he_n = he_prev
    elif n == 1:
        he_n = he
    else:
        for k in range(1, n):
            he_prev, he = he, z * he - k * he_prev
        he_n = he
    return var * ell ** (-n) * (-1.0) ** d1 * he_n * np.exp(-0.5 * z * z)


class TestDerivativeKernel:
    @pytest.fixture(scope="class")
    def rbf(self):
        return RBFDerivKernel()

    def test_k_vs_closed_form(self, rbf):
        """PRIMARY gate: kernel derivative covariances vs the exact
        Hermite-form mixed partials, through 8th total order (d1, d2 <= 4)
        at <= 1e-10 — the entries the heteroscedastic model leans on."""
        var, ell = 1.7, 0.9
        xs = np.array([-0.3, 0.1, 0.5, 1.2])
        for d1 in range(5):
            for d2 in range(5):
                X1 = np.stack([xs, np.full_like(xs, d1)], axis=1)
                X2 = np.stack([xs, np.full_like(xs, d2)], axis=1)
                got = np.asarray(rbf.K(X1, X2, params={"var": var, "l": ell}))
                expected = rbf_deriv_closed_form(
                    xs[:, None], xs[None, :], d1, d2, var, ell
                )
                np.testing.assert_allclose(
                    got, expected, rtol=1e-10, atol=1e-12
                )

    def test_multidim_rbf_closed_form(self):
        """Separable product closed form for the 2-D RBF with distinct
        lengthscales, through 2nd derivatives per dimension."""
        ells = (0.8, 1.6)
        var = 1.3
        expr, params = make_rbf_expr(2)
        kern = DerivativeKernel(expr, 2, kernel_params=params)
        pts = np.array([[0.0, 0.4], [0.5, 0.2], [0.1, 0.9], [1.0, -0.3]])
        pvals = {"var": var, "l_0": ells[0], "l_1": ells[1]}
        for orders1 in [(0, 0), (1, 0), (0, 2), (2, 1), (1, 2), (2, 2)]:
            for orders2 in [(0, 0), (0, 1), (2, 0), (1, 1), (2, 2)]:
                X1 = np.concatenate(
                    [pts, np.broadcast_to(orders1, pts.shape)], axis=1
                )
                X2 = np.concatenate(
                    [pts, np.broadcast_to(orders2, pts.shape)], axis=1
                )
                got = np.asarray(kern.K(X1, X2, params=pvals))
                expected = np.ones((len(pts), len(pts)))
                for dim in range(2):
                    v = var if dim == 0 else 1.0  # var enters once
                    expected = expected * rbf_deriv_closed_form(
                        pts[:, None, dim],
                        pts[None, :, dim],
                        orders1[dim],
                        orders2[dim],
                        v,
                        ells[dim],
                    )
                np.testing.assert_allclose(
                    got, expected, rtol=1e-10, atol=1e-12
                )

    def test_k_vs_finite_difference(self, rbf):
        var, ell = 1.7, 0.9
        f = lambda a, b: var * np.exp(-0.5 * ((a - b) / ell) ** 2)
        xs = np.array([0.1, 0.5, 1.2])
        for d1 in range(3):
            for d2 in range(3):
                # optimal FD step grows with total derivative order
                t = d1 + d2
                h = (1e-16) ** (1.0 / (t + 2))
                X1 = np.stack([xs, np.full_like(xs, d1)], axis=1)
                X2 = np.stack([xs, np.full_like(xs, d2)], axis=1)
                got = np.asarray(
                    rbf.K(X1, X2, params={"var": var, "l": ell})
                )
                for i, a in enumerate(xs):
                    for j, b in enumerate(xs):
                        expected = fd_mixed_partial(f, a, b, d1, d2, h=h)
                        np.testing.assert_allclose(
                            got[i, j], expected, rtol=5e-2, atol=1e-4
                        )

    def test_mixed_orders_one_matrix(self, rbf):
        """Rows with heterogeneous derivative orders assemble correctly."""
        X = np.array([[0.0, 0.0], [0.0, 1.0], [0.5, 2.0], [1.0, 0.0]])
        K = np.asarray(rbf.K(X))
        assert K.shape == (4, 4)
        # symmetric under swapping rows (by kernel symmetry of mixed partials)
        np.testing.assert_allclose(K, K.T, rtol=1e-10)

    def test_k_diag_matches_k(self, rbf):
        X = np.array([[0.0, 0.0], [0.3, 1.0], [0.7, 2.0], [0.9, 1.0]])
        K = np.asarray(rbf.K(X))
        Kd = np.asarray(rbf.K_diag(X))
        np.testing.assert_allclose(np.diag(K), Kd, rtol=1e-12)

    @pytest.mark.parametrize("factory", [make_matern_expr, make_poly_expr])
    def test_other_kernels_fd(self, factory):
        expr, params = factory(3)
        kern = DerivativeKernel(expr, 1, kernel_params=params)
        x1s, x2s = sp.symbols("x1 x2", real=True)
        ell, var = sp.symbols("l var", real=True)
        base = sp.lambdify((x1s, x2s, ell, var), expr, modules="numpy")
        f = lambda a, b: base(a, b, 1.3, 0.8)
        # distinct locations: |x1-x2| kernels (Matern) are non-differentiable
        # at coincident points (same in the reference implementation)
        xs1 = np.array([0.4, 0.9])
        xs2 = np.array([0.15, 0.7])
        for d1, d2 in [(0, 0), (1, 0), (1, 1), (2, 1)]:
            h = (1e-16) ** (1.0 / (d1 + d2 + 2))
            X1 = np.stack([xs1, np.full_like(xs1, d1)], axis=1)
            X2 = np.stack([xs2, np.full_like(xs2, d2)], axis=1)
            got = np.asarray(kern.K(X1, X2, params={"l": 1.3, "var": 0.8}))
            for i, a in enumerate(xs1):
                for j, b in enumerate(xs2):
                    expected = fd_mixed_partial(f, a, b, d1, d2, h=h)
                    np.testing.assert_allclose(
                        got[i, j], expected, rtol=5e-2, atol=1e-4
                    )

    def test_multidim_rbf(self):
        expr, params = make_rbf_expr(2)
        kern = DerivativeKernel(expr, 2, kernel_params=params)
        X = np.array(
            [[0.0, 0.0, 0.0, 0.0], [0.5, 0.2, 1.0, 0.0], [0.1, 0.9, 0.0, 1.0]]
        )
        K = np.asarray(kern.K(X))
        assert K.shape == (3, 3)
        np.testing.assert_allclose(K, K.T, rtol=1e-10)
        np.testing.assert_allclose(np.diag(K), np.asarray(kern.K_diag(X)), rtol=1e-12)


class TestLikelihood:
    def test_multioutput_mvn_vs_scipy(self, rng_np):
        n, d = 6, 3
        x = rng_np.normal(size=(n, d))
        mu = rng_np.normal(size=(n, d))
        covs = []
        for _ in range(d):
            a = rng_np.normal(size=(n, n))
            covs.append(a @ a.T + n * np.eye(n))
        covs = np.stack(covs)
        chol = np.linalg.cholesky(covs)
        got = np.asarray(multioutput_multivariate_normal(x, mu, chol))
        for k in range(d):
            expected = stats.multivariate_normal.logpdf(x[:, k], mu[:, k], covs[k])
            np.testing.assert_allclose(got[k], expected, rtol=1e-9)

    def test_scaled_cov(self):
        from thermoextrap_tpu.gpr_active.gp_models import HetGaussianDeriv

        n = 4
        cov = np.eye(n) * 2.0
        lik = HetGaussianDeriv(cov, obs_dims=1, p=0.5, s=0.0)
        X = np.array([[0.0, 0.0], [0.0, 1.0], [0.0, 2.0], [1.0, 0.0]])
        out = np.asarray(lik.build_scaled_cov_mat(X))
        d = X[:, 1]
        expected = np.diag(2.0 * np.exp(2 * 0.5 * (d + 1))) + 1e-12 * np.eye(n)
        np.testing.assert_allclose(out[0], expected, rtol=1e-10)


class TestMeanFunctions:
    def test_constant(self):
        y = np.array([[1.0], [3.0]])
        mf = ConstantMeanWithDerivs(y)
        X = np.array([[0.0, 0.0], [0.5, 1.0], [1.0, 0.0]])
        np.testing.assert_allclose(
            np.asarray(mf(X))[:, 0], [2.0, 0.0, 2.0], rtol=1e-12
        )

    def test_linear(self, rng_np):
        x = rng_np.uniform(size=(10, 1))
        slope, b = 2.5, -1.0
        y = slope * x + b
        mf = LinearWithDerivs(x, y)
        X = np.array([[0.2, 0.0], [0.4, 1.0], [0.6, 2.0]])
        out = np.asarray(mf(X))[:, 0]
        np.testing.assert_allclose(out[0], slope * 0.2 + b, rtol=1e-8)
        np.testing.assert_allclose(out[1], slope, rtol=1e-8)
        np.testing.assert_allclose(out[2], 0.0, atol=1e-10)

    def test_sympy_mean(self, rng_np):
        a_sym, x_sym = sp.symbols("a x", real=True)
        expr = a_sym * x_sym**2
        x = rng_np.uniform(0.5, 1.5, size=(20, 1))
        y = 3.0 * x**2
        mf = SympyMeanFunc(expr, x, y)
        np.testing.assert_allclose(mf.param_values["a"], 3.0, rtol=1e-5)
        X = np.array([[1.0, 0.0], [1.0, 1.0], [1.0, 2.0], [1.0, 3.0]])
        out = np.asarray(mf(X))[:, 0]
        np.testing.assert_allclose(out, [3.0, 6.0, 6.0, 0.0], rtol=1e-5, atol=1e-8)


class TestHeteroscedasticGPR:
    @pytest.fixture(scope="class")
    def sine_fit(self):
        """Train on noisy sine + derivative data; predictions should track
        the true function within the noise level."""
        rng = np.random.default_rng(0)
        xs = np.linspace(0.0, 2.0 * np.pi, 8)
        noise0, noise1 = 0.02, 0.05
        y0 = np.sin(xs) + rng.normal(0, noise0, xs.shape)
        y1 = np.cos(xs) + rng.normal(0, noise1, xs.shape)

        X = np.concatenate(
            [
                np.stack([xs, np.zeros_like(xs)], axis=1),
                np.stack([xs, np.ones_like(xs)], axis=1),
            ]
        )
        Y = np.concatenate([y0, y1])[:, None]
        cov = np.diag(
            np.concatenate(
                [np.full_like(xs, noise0**2), np.full_like(xs, noise1**2)]
            )
        )
        model = HeteroscedasticGPR(
            (X, Y, cov),
            kernel=RBFDerivKernel(),
            likelihood_kwargs={"p": 1.0},
        )
        res = model.train()
        return model, res

    def test_trains(self, sine_fit):
        model, res = sine_fit
        assert np.isfinite(res.fun)
        params = model.parameters()
        assert params["kernel/l"] > 0
        assert params["kernel/var"] > 0

    def test_logwhitened_lml_identity(self, sine_fit):
        """The log-space-whitened LML is the SAME function as the plain
        one (f64): it exists so f32 device training can't overflow on the
        order-scaled noise diagonal (F32_TRAIN_EXPERIMENT.json)."""
        import jax.numpy as jnp

        from thermoextrap_tpu.gpr_active import gp_models as gm

        model, res = sine_fit
        fns = model._lml_fns()
        bound = model._bound_args()
        with gm._compute_ctx():
            for vec in (res.x, np.zeros_like(res.x), np.full_like(res.x, 0.7)):
                v = float(fns["lml"](jnp.asarray(vec, jnp.float64), *bound))
                w = float(
                    fns["lml_logw"](jnp.asarray(vec, jnp.float64), *bound)
                )
                assert abs(v - w) < 1e-8 * max(1.0, abs(v))

    def test_logwhitened_zero_cov_rows_extreme_scale(self, sine_fit):
        """Exactly-zero noise-cov diagonal entries must contribute NOTHING
        to the whitened factors at ANY likelihood scale (ADVICE r4): on a
        zero-cov row ``exp(lsc - ld/2) ~ exp(lsc)`` overflows f32 once
        ``lsc`` is large enough (s=250 → exp(145) = inf) and ``0*inf``
        poisons the whitened matrix with NaN; the mask keeps the f64
        plain-LML identity and the f32 evaluation finite+accurate."""
        import jax.numpy as jnp

        from thermoextrap_tpu.gpr_active import gp_models as gm

        model0, _ = sine_fit
        X = model0.X
        Y = np.asarray(model0._y_np)
        cov = np.asarray(model0.likelihood.cov_np)[0].copy()
        n = cov.shape[0]
        # zero out the derivative rows' noise entirely (exact zeros)
        cov[n // 2 :, :] = 0.0
        cov[:, n // 2 :] = 0.0
        for s in (0.0, 100.0, 250.0, 300.0):
            model = HeteroscedasticGPR(
                (X, Y, cov),
                kernel=RBFDerivKernel(),
                likelihood_kwargs={"p": 10.0, "s": s},
            )
            fns = model._lml_fns()
            bound = model._bound_args()
            vec = np.asarray(model.get_unconstrained(), np.float64)
            with gm._compute_ctx():
                v = float(fns["lml"](jnp.asarray(vec), *bound))
                w = float(fns["lml_logw"](jnp.asarray(vec), *bound))
            assert abs(v - w) < 1e-8 * max(1.0, abs(v)), (s, v, w)
            b32 = [jnp.asarray(np.asarray(b), jnp.float32) for b in bound]
            w32 = float(fns["lml_logw"](jnp.asarray(vec, jnp.float32), *b32))
            assert np.isfinite(w32), (s, w32)
            assert abs(w32 - v) < 1e-4 * max(1.0, abs(v)), (s, v, w32)

    def test_on_device_f32_train_reaches_f64_optimum(self, sine_fit):
        """train(on_device=True): f32 log-whitened L-BFGS lands at the
        host-f64 optimum's NLL (within f32 slop) with no NaN rollback."""
        from thermoextrap_tpu.gpr_active import gp_models as gm

        model64, res64 = sine_fit
        X = model64.X
        Y = np.asarray(model64._y_np)
        cov = np.asarray(model64.likelihood.cov_np)[0]
        model = HeteroscedasticGPR(
            (X, Y, cov), kernel=RBFDerivKernel(), likelihood_kwargs={"p": 1.0}
        )
        res = model.train(on_device=True)
        with gm._compute_ctx():
            nll64_at = float(model64.neg_lml(np.asarray(res.x, np.float64)))
        assert np.isfinite(res.fun)
        assert nll64_at <= float(res64.fun) + 0.05, (
            f"f32 on-device optimum {nll64_at} worse than f64 {res64.fun}"
        )

    def test_prediction_accuracy(self, sine_fit):
        model, _ = sine_fit
        xt = np.linspace(0.5, 5.5, 11)
        Xt = np.stack([xt, np.zeros_like(xt)], axis=1)
        mean, var = model.predict_f(Xt)
        mean = np.asarray(mean)[:, 0]
        std = np.sqrt(np.asarray(var)[:, 0])
        err = np.abs(mean - np.sin(xt))
        assert np.all(err < np.maximum(4 * std, 0.1))

    def test_derivative_prediction(self, sine_fit):
        model, _ = sine_fit
        xt = np.linspace(1.0, 5.0, 5)
        Xt = np.stack([xt, np.ones_like(xt)], axis=1)
        mean, _var = model.predict_f(Xt)
        err = np.abs(np.asarray(mean)[:, 0] - np.cos(xt))
        assert np.max(err) < 0.25

    def test_full_cov_consistent(self, sine_fit):
        model, _ = sine_fit
        xt = np.linspace(1.0, 5.0, 4)
        Xt = np.stack([xt, np.zeros_like(xt)], axis=1)
        _m1, v_diag = model.predict_f(Xt, full_cov=False)
        _m2, v_full = model.predict_f(Xt, full_cov=True)
        np.testing.assert_allclose(
            np.asarray(v_diag)[:, 0],
            np.diag(np.asarray(v_full)[0]),
            rtol=1e-8,
            atol=1e-12,
        )

    def test_lml_improves_with_training(self):
        rng = np.random.default_rng(1)
        xs = np.linspace(0, 3, 5)
        y = (xs**2 + rng.normal(0, 0.01, xs.shape))[:, None]
        X = np.stack([xs, np.zeros_like(xs)], axis=1)
        cov = np.eye(5) * 1e-4
        model = HeteroscedasticGPR((X, y, cov), kernel=RBFDerivKernel())
        before = float(model.log_marginal_likelihood())
        model.train()
        after = float(model.log_marginal_likelihood())
        assert after >= before

    def test_multioutput(self, rng_np):
        xs = np.linspace(0, 1, 6)
        X = np.stack([xs, np.zeros_like(xs)], axis=1)
        Y = np.stack([np.sin(xs), 10 * np.cos(xs)], axis=1)
        cov = np.eye(6) * 1e-4
        model = HeteroscedasticGPR(
            (X, Y, cov), kernel=RBFDerivKernel(), scale_fac=[1.0, 10.0]
        )
        model.train(max_iter=200)
        mean, var = model.predict_f(X)
        assert np.asarray(mean).shape == (6, 2)
        np.testing.assert_allclose(np.asarray(mean), Y, atol=0.15)


class TestCallableDerivativeKernel:
    def test_matches_sympy_rbf(self):
        """Nested-jax.grad kernel == sympy-differentiated RBF kernel."""
        import jax.numpy as jnp

        from thermoextrap_tpu.gpr_active.kernels import CallableDerivativeKernel

        def rbf(x1, x2, var, ell):
            return var * jnp.exp(-0.5 * ((x1[0] - x2[0]) / ell) ** 2)

        k_call = CallableDerivativeKernel(
            rbf, obs_dims=1, kernel_params={"var": 1.4, "l": 0.8}
        )
        k_sym = RBFDerivKernel()
        params = {"var": 1.4, "l": 0.8}

        X = np.array(
            [[0.1, 0.0], [0.4, 1.0], [0.9, 2.0], [1.3, 0.0], [0.6, 3.0]]
        )
        K1 = np.asarray(k_call.K(X))
        K2 = np.asarray(k_sym.K(X, params=params))
        np.testing.assert_allclose(K1, K2, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(k_call.K_diag(X)),
            np.asarray(k_sym.K_diag(X, params=params)),
            rtol=1e-8,
        )

    def test_trains_in_gpr(self):
        import jax.numpy as jnp

        from thermoextrap_tpu.gpr_active.kernels import CallableDerivativeKernel

        def rbf(x1, x2, var, ell):
            return var * jnp.exp(-0.5 * ((x1[0] - x2[0]) / ell) ** 2)

        xs = np.linspace(0, 3, 6)
        y = np.sin(xs)[:, None]
        X = np.stack([xs, np.zeros_like(xs)], axis=1)
        model = HeteroscedasticGPR(
            (X, y, np.eye(6) * 1e-4),
            kernel=CallableDerivativeKernel(
                rbf, kernel_params={"var": 1.0, "l": 1.0}
            ),
        )
        model.train(max_iter=100)
        mu, _ = model.predict_f(X)
        np.testing.assert_allclose(np.asarray(mu), y, atol=0.05)

    def test_distinct_fns_use_distinct_compiled_cores(self):
        """Two callable kernels with different fns (same param names, same
        data shapes) must NOT share a compiled LML core: the structure key
        is the callable itself (srepr of a None expression is the constant
        'None' and used to collide every callable kernel onto one core)."""
        import jax.numpy as jnp

        from thermoextrap_tpu.gpr_active.kernels import CallableDerivativeKernel

        def rbf(x1, x2, var, ell):
            return var * jnp.exp(-0.5 * ((x1[0] - x2[0]) / ell) ** 2)

        def cosine(x1, x2, var, ell):
            return var * jnp.cos((x1[0] - x2[0]) / ell)

        xs = np.linspace(0, 3, 6)
        y = np.sin(xs)[:, None]
        X = np.stack([xs, np.zeros_like(xs)], axis=1)
        data = (X, y, np.eye(6) * 1e-4)
        m1 = HeteroscedasticGPR(
            data,
            kernel=CallableDerivativeKernel(
                rbf, kernel_params={"var": 1.0, "l": 1.0}
            ),
        )
        m2 = HeteroscedasticGPR(
            data,
            kernel=CallableDerivativeKernel(
                cosine, kernel_params={"var": 1.0, "l": 1.0}
            ),
        )
        assert m1._structure_key() != m2._structure_key()
        lml1 = float(m1.log_marginal_likelihood())
        lml2 = float(m2.log_marginal_likelihood())
        assert lml1 != lml2


class TestAnalyticalScaleGPR:
    """HeteroscedasticGPRAnalyticalScale: profiled global noise/signal scale
    (reference gp_models.py:812-955)."""

    @pytest.fixture(scope="class")
    def sine_data(self):
        rng = np.random.default_rng(1)
        xs = np.linspace(0.0, 2.0 * np.pi, 8)
        noise0, noise1 = 0.02, 0.05
        y0 = np.sin(xs) + rng.normal(0, noise0, xs.shape)
        y1 = np.cos(xs) + rng.normal(0, noise1, xs.shape)
        X = np.concatenate(
            [
                np.stack([xs, np.zeros_like(xs)], axis=1),
                np.stack([xs, np.ones_like(xs)], axis=1),
            ]
        )
        Y = np.concatenate([y0, y1])[:, None]
        cov = np.diag(
            np.concatenate(
                [np.full_like(xs, noise0**2), np.full_like(xs, noise1**2)]
            )
        )
        return X, Y, cov

    def test_concentrated_lml_formula(self, sine_data):
        """LML matches an explicit numpy evaluation of the concentrated
        (Binois-style) objective at the current parameters."""
        from thermoextrap_tpu.gpr_active.gp_models import (
            HeteroscedasticGPRAnalyticalScale,
        )

        X, Y, cov = sine_data
        model = HeteroscedasticGPRAnalyticalScale(
            (X, Y, cov), kernel=RBFDerivKernel()
        )
        lml = float(model.log_marginal_likelihood())

        sf = float(np.asarray(model.scale_fac)[0])
        k = np.asarray(model.kernel.K(X))
        s = cov / sf**2
        ks = k + s + 1e-12 * np.eye(len(X))
        ell = np.linalg.cholesky(ks)
        err = Y[:, 0] / sf
        alpha = np.linalg.solve(ell, err)
        n = len(X)
        v = float(alpha @ alpha) / n
        expect = (
            -0.5 * n * np.log(v)
            - 0.5 * n * np.log(2 * np.pi)
            - np.sum(np.log(np.diag(ell)))
            - 0.5 * n
        )
        np.testing.assert_allclose(lml, expect, rtol=1e-9)
        np.testing.assert_allclose(
            float(np.asarray(model.calc_scale_v())[0]), v, rtol=1e-9
        )

    def test_mean_matches_standard_var_scales_by_v(self, sine_data):
        """Posterior mean is v-independent (== the standard model with the
        same frozen parameters); posterior variance is the standard one
        times v."""
        from thermoextrap_tpu.gpr_active.gp_models import (
            HeteroscedasticGPRAnalyticalScale,
        )

        X, Y, cov = sine_data
        model_v = HeteroscedasticGPRAnalyticalScale(
            (X, Y, cov), kernel=RBFDerivKernel(), scale_fac=1.0
        )
        model_s = HeteroscedasticGPR(
            (X, Y, cov),
            kernel=RBFDerivKernel(),
            likelihood_kwargs={
                "p": 0.0,
                "constrain_p": True,
                "transform_p": "none",
            },
        )
        xt = np.linspace(0.5, 5.5, 7)
        Xt = np.stack([xt, np.zeros_like(xt)], axis=1)
        mu_v, var_v = (np.asarray(a) for a in model_v.predict_f(Xt))
        mu_s, var_s = (np.asarray(a) for a in model_s.predict_f(Xt))
        v = float(np.asarray(model_v.calc_scale_v())[0])
        np.testing.assert_allclose(mu_v, mu_s, rtol=1e-8)
        np.testing.assert_allclose(var_v, var_s * v, rtol=1e-8)

    def test_trains_and_predicts(self, sine_data):
        from thermoextrap_tpu.gpr_active.gp_models import (
            HeteroscedasticGPRAnalyticalScale,
        )

        X, Y, cov = sine_data
        model = HeteroscedasticGPRAnalyticalScale(
            (X, Y, cov), kernel=RBFDerivKernel()
        )
        res = model.train()
        assert np.isfinite(res.fun)
        assert float(np.asarray(model.calc_scale_v())[0]) > 0

        xt = np.linspace(0.5, 5.5, 11)
        Xt = np.stack([xt, np.zeros_like(xt)], axis=1)
        mean, var = model.predict_f(Xt)
        mean = np.asarray(mean)[:, 0]
        std = np.sqrt(np.asarray(var)[:, 0])
        err = np.abs(mean - np.sin(xt))
        assert np.all(err < np.maximum(4 * std, 0.1))

    def test_create_base_gp_model_class(self, sine_data):
        """create_base_GP_model(model_class=...) swaps in the variant."""
        from thermoextrap_tpu.gpr_active import active_utils as au
        from thermoextrap_tpu.gpr_active.gp_models import (
            HeteroscedasticGPRAnalyticalScale,
        )

        X, Y, cov = sine_data
        model = au.create_base_GP_model(
            (X, Y, cov), model_class=HeteroscedasticGPRAnalyticalScale
        )
        assert isinstance(model, HeteroscedasticGPRAnalyticalScale)
        res = model.train(max_iter=50)
        assert np.isfinite(res.fun)


class TestHetGaussianSimple:
    """HetGaussianSimple: provided cov x one trainable scalar scale
    (reference gp_models.py:479-567, the maintained rebuild)."""

    def test_scaled_cov_is_scalar_multiple(self):
        from thermoextrap_tpu.gpr_active.gp_models import HetGaussianSimple

        rng = np.random.default_rng(3)
        a = rng.normal(size=(5, 5))
        cov = a @ a.T + 5 * np.eye(5)
        lik = HetGaussianSimple(cov, obs_dims=1, init_scale=2.5)
        # derivative orders must NOT affect the scaling
        X = np.array(
            [[0.0, 0.0], [0.1, 1.0], [0.2, 2.0], [0.3, 3.0], [0.4, 0.0]]
        )
        out = np.asarray(lik.build_scaled_cov_mat(X))[0]
        expected = 2.5 * cov
        np.testing.assert_allclose(
            out, expected + np.diag(np.full(5, 1e-12)), rtol=1e-10
        )
        np.testing.assert_allclose(lik.scale_noise, 2.5, rtol=1e-12)

    def test_lml_matches_deriv_special_case(self):
        """== HetGaussianDeriv with p=0, s=log(scale) at the same params."""
        from thermoextrap_tpu.gpr_active.gp_models import HetGaussianSimple

        xs = np.linspace(0, 2, 5)
        X = np.stack([xs, np.zeros_like(xs)], axis=1)
        Y = np.sin(xs)[:, None]
        cov = np.eye(5) * 1e-3
        m_simple = HeteroscedasticGPR(
            (X, Y, cov),
            kernel=RBFDerivKernel(),
            likelihood_class=HetGaussianSimple,
            likelihood_kwargs={"init_scale": 1.7},
        )
        m_deriv = HeteroscedasticGPR(
            (X, Y, cov),
            kernel=RBFDerivKernel(),
            likelihood_kwargs={
                "p": 0.0,
                "s": float(np.log(1.7)),
                "constrain_p": True,
                "constrain_s": True,
                "transform_p": "none",
                "transform_s": "none",
            },
        )
        np.testing.assert_allclose(
            float(m_simple.log_marginal_likelihood()),
            float(m_deriv.log_marginal_likelihood()),
            rtol=1e-10,
        )

    def test_trains(self):
        from thermoextrap_tpu.gpr_active.gp_models import HetGaussianSimple

        rng = np.random.default_rng(0)
        xs = np.linspace(0.0, 2.0 * np.pi, 10)
        y = (np.sin(xs) + rng.normal(0, 0.05, xs.shape))[:, None]
        X = np.stack([xs, np.zeros_like(xs)], axis=1)
        cov = np.eye(10) * 0.05**2
        model = HeteroscedasticGPR(
            (X, y, cov),
            kernel=RBFDerivKernel(),
            likelihood_class=HetGaussianSimple,
        )
        res = model.train()
        assert np.isfinite(res.fun)
        assert model.likelihood.scale_noise > 0
        assert "likelihood/s" in model.trainable_names()
        assert "likelihood/p" not in model.trainable_names()
        mu, _ = model.predict_f(X)
        np.testing.assert_allclose(np.asarray(mu), y, atol=0.2)


class TestPredictFBatched:
    """predict_f_batched == per-model predict_f, model by model (the
    vmapped compiled core behind the UpdateALCbrute candidate scan)."""

    def _make_model(self, loc_shift, p_val, rng):
        xs = np.linspace(0.0, 2.0 * np.pi, 6) + loc_shift
        y0 = np.sin(xs) + rng.normal(0, 0.02, xs.shape)
        y1 = np.cos(xs) + rng.normal(0, 0.05, xs.shape)
        X = np.concatenate(
            [
                np.stack([xs, np.zeros_like(xs)], axis=1),
                np.stack([xs, np.ones_like(xs)], axis=1),
            ]
        )
        Y = np.concatenate([y0, y1])[:, None]
        cov = np.diag(np.concatenate([np.full_like(xs, 4e-4), np.full_like(xs, 2.5e-3)]))
        m = HeteroscedasticGPR(
            (X, Y, cov), kernel=RBFDerivKernel(), likelihood_kwargs={"p": p_val}
        )
        m.set_parameters({"kernel/l": 1.0 + 0.2 * loc_shift, "kernel/var": 0.8})
        return m

    def test_matches_per_model(self):
        from thermoextrap_tpu.gpr_active.gp_models import predict_f_batched

        rng = np.random.default_rng(3)
        # different data AND different parameter values per model
        models = [self._make_model(s, p, rng) for s, p in
                  [(0.0, 1.0), (0.3, 0.5), (-0.2, 2.0)]]
        xt = np.linspace(0.5, 5.5, 9)
        Xt = np.stack([xt, np.zeros_like(xt)], axis=1)
        bm, bv = predict_f_batched(models, Xt)
        bm, bv = np.asarray(bm), np.asarray(bv)
        assert bm.shape == (3, 9, 1) and bv.shape == (3, 9, 1)
        for i, m in enumerate(models):
            mu, var = m.predict_f(Xt)
            np.testing.assert_allclose(bm[i], np.asarray(mu), rtol=1e-10, atol=1e-12)
            np.testing.assert_allclose(bv[i], np.asarray(var), rtol=1e-10, atol=1e-12)

    def test_rejects_structure_mismatch(self):
        from thermoextrap_tpu.gpr_active.gp_models import predict_f_batched

        rng = np.random.default_rng(4)
        m1 = self._make_model(0.0, 1.0, rng)
        m2 = self._make_model(0.1, 1.0, rng)
        m2._groups = m1._groups  # same groups; now break the data shape
        m2._locs_np = m2._locs_np[:-1]
        m2.X = m2.X[:-1]
        with pytest.raises(ValueError, match="structurally identical"):
            predict_f_batched([m1, m2], np.array([[1.0, 0.0]]))
