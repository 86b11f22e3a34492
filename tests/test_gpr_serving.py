"""Frozen on-chip GPR serving: freeze_predictor + export_gpr_predictor.

The frozen predictor folds the host-f64 training-side solves into
constants and predicts with pure matmuls; at dtype=f64 it must reproduce
``HeteroscedasticGPR.predict_f`` exactly (same math), and at the serving
f32 it must match to f32 conditioning (mean ~1e-4 relative; variance to
the intrinsic ``k** - qf`` cancellation floor of ~eps * k(x, x)).

No reference analogue — the reference predicts through its training TF
graph (reference gpr_active/gp_models.py:1040-1156).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import sympy as sp

from thermoextrap_tpu.gpr_active.gp_models import (
    ConstantMeanWithDerivs,
    HeteroscedasticGPR,
    HeteroscedasticGPRAnalyticalScale,
    LinearWithDerivs,
    SympyMeanFunc,
)
from thermoextrap_tpu.gpr_active.kernels import RBFDerivKernel
from thermoextrap_tpu.gpr_active.serving import freeze_predictor
from thermoextrap_tpu import serving_export as se


def _sine_data(out_dim: int = 1):
    rng = np.random.default_rng(0)
    xs = np.linspace(0.0, 2 * np.pi, 8)
    y0 = np.sin(xs) + rng.normal(0, 0.02, xs.shape)
    y1 = np.cos(xs) + rng.normal(0, 0.05, xs.shape)
    X = np.concatenate(
        [
            np.stack([xs, np.zeros_like(xs)], 1),
            np.stack([xs, np.ones_like(xs)], 1),
        ]
    )
    Y = np.concatenate([y0, y1])[:, None]
    if out_dim == 2:
        Y = np.concatenate([Y, 2.0 * Y + 1.0], axis=1)
    cov = np.diag(np.concatenate([np.full_like(xs, 4e-4), np.full_like(xs, 2.5e-3)]))
    return X, Y, cov


@pytest.fixture(scope="module")
def trained():
    X, Y, cov = _sine_data()
    model = HeteroscedasticGPR(
        (X, Y, cov), kernel=RBFDerivKernel(), likelihood_kwargs={"p": 1.0}
    )
    model.train()
    return model


XT = np.linspace(0.5, 5.5, 11)


class TestFreezePredictor:
    def test_f64_exact_vs_predict_f(self, trained):
        Xt = np.stack([XT, np.zeros_like(XT)], 1)
        mean_ref, var_ref = map(np.asarray, trained.predict_f(Xt))
        pred = freeze_predictor(trained, dtype=jnp.float64)
        mean, var = map(np.asarray, pred(XT))
        np.testing.assert_allclose(mean, mean_ref, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(var, var_ref, rtol=1e-7, atol=1e-12)

    def test_f32_serving_accuracy(self, trained):
        Xt = np.stack([XT, np.zeros_like(XT)], 1)
        mean_ref, var_ref = map(np.asarray, trained.predict_f(Xt))
        pred = freeze_predictor(trained)  # default f32
        mean, var = map(np.asarray, pred(XT))
        assert mean.dtype == np.float32
        np.testing.assert_allclose(mean, mean_ref, rtol=3e-4, atol=3e-5)
        # variance floor ~ eps * sqrt(cond) * k(x,x) with the whitened
        # form (measured ~5e-7 * kvar; the folded-inverse form was 320x
        # worse on this Gram)
        kvar = float(trained.parameters()["kernel/var"])
        assert np.all(var >= 0.0)
        np.testing.assert_allclose(var, var_ref, atol=5e-6 * kvar, rtol=3e-3)

    def test_derivative_query_order(self, trained):
        Xt1 = np.stack([XT, np.ones_like(XT)], 1)
        mean_ref, var_ref = map(np.asarray, trained.predict_f(Xt1))
        pred = freeze_predictor(trained, d_new=(1,), dtype=jnp.float64)
        mean, var = map(np.asarray, pred(XT))
        np.testing.assert_allclose(mean, mean_ref, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(var, var_ref, rtol=1e-7, atol=1e-12)

    def test_analytic_scale_variant(self):
        X, Y, cov = _sine_data()
        model = HeteroscedasticGPRAnalyticalScale(
            (X, Y, cov),
            kernel=RBFDerivKernel(),
            mean_function=ConstantMeanWithDerivs(Y, x_dim=1),
        )
        model.train()
        Xt = np.stack([XT, np.zeros_like(XT)], 1)
        mean_ref, var_ref = map(np.asarray, model.predict_f(Xt))
        pred = freeze_predictor(model, dtype=jnp.float64)
        assert pred.meta["analytic_scale"]
        mean, var = map(np.asarray, pred(XT))
        np.testing.assert_allclose(mean, mean_ref, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(var, var_ref, rtol=1e-7, atol=1e-12)

    def test_multioutput_scale_fac(self):
        X, Y, cov = _sine_data(out_dim=2)
        model = HeteroscedasticGPR(
            (X, Y, cov), kernel=RBFDerivKernel(), scale_fac=[1.0, 10.0]
        )
        Xt = np.stack([XT, np.zeros_like(XT)], 1)
        mean_ref, var_ref = map(np.asarray, model.predict_f(Xt))
        pred = freeze_predictor(model, dtype=jnp.float64)
        mean, var = map(np.asarray, pred(XT))
        assert mean.shape == (len(XT), 2)
        np.testing.assert_allclose(mean, mean_ref, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(var, var_ref, rtol=1e-7, atol=1e-12)

    @pytest.mark.parametrize("d_new", [(0,), (1,)])
    def test_linear_mean_function(self, d_new):
        X, Y, cov = _sine_data()
        x0 = X[X[:, 1] == 0.0, :1]
        y0 = Y[X[:, 1] == 0.0]
        model = HeteroscedasticGPR(
            (X, Y, cov),
            kernel=RBFDerivKernel(),
            mean_function=LinearWithDerivs(x0, y0),
        )
        Xt = np.stack([XT, np.full_like(XT, d_new[0])], 1)
        mean_ref, var_ref = map(np.asarray, model.predict_f(Xt))
        pred = freeze_predictor(model, d_new=d_new, dtype=jnp.float64)
        mean, var = map(np.asarray, pred(XT))
        np.testing.assert_allclose(mean, mean_ref, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(var, var_ref, rtol=1e-7, atol=1e-12)

    def test_sympy_mean_function(self):
        X, Y, cov = _sine_data()
        x0 = X[X[:, 1] == 0.0, :1]
        y0 = Y[X[:, 1] == 0.0]
        x, a, b = sp.symbols("x a b")
        mf = SympyMeanFunc(a * sp.sin(x) + b, x0, y0)
        model = HeteroscedasticGPR((X, Y, cov), kernel=RBFDerivKernel(), mean_function=mf)
        Xt = np.stack([XT, np.zeros_like(XT)], 1)
        mean_ref, var_ref = map(np.asarray, model.predict_f(Xt))
        pred = freeze_predictor(model, dtype=jnp.float64)
        mean, var = map(np.asarray, pred(XT))
        np.testing.assert_allclose(mean, mean_ref, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(var, var_ref, rtol=1e-7, atol=1e-12)

    def test_custom_mean_requires_override(self, trained):
        class Weird:
            def __call__(self, X):
                return np.zeros((np.asarray(X).shape[0], 1))

        X, Y, cov = _sine_data()
        model = HeteroscedasticGPR((X, Y, cov), kernel=RBFDerivKernel(), mean_function=Weird())
        with pytest.raises(TypeError, match="mean_new_fn"):
            freeze_predictor(model)
        # the override path works
        pred = freeze_predictor(
            model,
            dtype=jnp.float64,
            mean_new_fn=lambda locs: jnp.zeros((locs.shape[0], 1), locs.dtype),
        )
        mean, _ = pred(XT)
        assert np.all(np.isfinite(np.asarray(mean)))

    def test_callable_kernel_freezes(self):
        """Nested-jax.grad kernels (CallableDerivativeKernel) freeze too —
        the predictor only needs pair_table/params, shared via the base."""
        from thermoextrap_tpu.gpr_active.kernels import (
            CallableDerivativeKernel,
        )

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
        mean_ref, var_ref = map(np.asarray, model.predict_f(
            np.stack([XT, np.zeros_like(XT)], 1)
        ))
        pred = freeze_predictor(model, dtype=jnp.float64)
        mean, var = map(np.asarray, pred(XT))
        np.testing.assert_allclose(mean, mean_ref, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(var, var_ref, rtol=1e-7, atol=1e-12)

    def test_multidim_observable(self):
        """obs_dims=2: the frozen 2-D kernel block + mixed query order
        match predict_f exactly at f64."""
        from thermoextrap_tpu.gpr_active.gp_models import DerivativeKernel
        from thermoextrap_tpu.gpr_active.kernels import make_rbf_expr

        rng = np.random.default_rng(3)
        expr, params = make_rbf_expr(2)
        kern = DerivativeKernel(expr, 2, kernel_params=params)
        locs = rng.uniform(0, 2, (6, 2))
        X = np.concatenate(
            [
                np.concatenate([locs, np.zeros_like(locs)], axis=1),
                np.concatenate([locs, np.tile([[1.0, 0.0]], (6, 1))], axis=1),
            ]
        )
        Y = rng.normal(size=(12, 1))
        cov = np.diag(np.full(12, 1e-3))
        model = HeteroscedasticGPR((X, Y, cov), kernel=kern)

        qt = rng.uniform(0, 2, (9, 2))
        for d_new in [(0, 0), (1, 0)]:
            Xt = np.concatenate([qt, np.tile([d_new], (9, 1))], axis=1)
            mean_ref, var_ref = map(np.asarray, model.predict_f(Xt))
            pred = freeze_predictor(model, d_new=d_new, dtype=jnp.float64)
            mean, var = map(np.asarray, pred(qt))
            np.testing.assert_allclose(mean, mean_ref, rtol=1e-9, atol=1e-12)
            np.testing.assert_allclose(var, var_ref, rtol=1e-7, atol=1e-12)

    def test_sharded_queries_match_single_device(self, trained):
        """Posterior queries are data-parallel over the mesh rec axis; a
        sharded input must produce exactly the single-device output."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from thermoextrap_tpu.parallel.sharded import make_mesh

        pred = freeze_predictor(trained, dtype=jnp.float64)
        locs = jnp.linspace(0.5, 5.5, 64)[:, None]
        want = tuple(np.asarray(a) for a in pred(locs))
        mesh = make_mesh(8)
        locs_s = jax.device_put(locs, NamedSharding(mesh, P("rec", None)))
        got = jax.jit(pred.predict_fn)(locs_s)
        # equal up to f64 summation order (partitioned matmul reductions)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, rtol=1e-9, atol=1e-14)

    def test_f64_freeze_requires_x64(self, trained):
        """Without x64 the f64 constants would silently truncate to f32
        while meta still claimed float64 — must refuse instead."""
        import jax

        assert jax.config.jax_enable_x64  # conftest forces it on
        jax.config.update("jax_enable_x64", False)
        try:
            with pytest.raises(ValueError, match="x64"):
                freeze_predictor(trained, dtype=jnp.float64)
        finally:
            jax.config.update("jax_enable_x64", True)

    def test_input_validation(self, trained):
        pred = freeze_predictor(trained)
        with pytest.raises(ValueError, match=r"locs must be \(M, 1\)"):
            pred(np.zeros((3, 2)))
        with pytest.raises(ValueError, match="d_new must have 1"):
            freeze_predictor(trained, d_new=(0, 0))
        with pytest.raises(TypeError, match="HeteroscedasticGPR"):
            freeze_predictor(object())


class TestExportGPRPredictor:
    def test_roundtrip_polymorphic_m(self, trained, tmp_path):
        art = se.export_gpr_predictor(trained, dtype=jnp.float64)
        assert art.meta["family"] == "gpr"
        path = tmp_path / "gpr.bin"
        art.save(path)
        art2 = se.load_exported(path)
        Xt = np.stack([XT, np.zeros_like(XT)], 1)
        mean_ref, var_ref = map(np.asarray, trained.predict_f(Xt))
        mean, var = map(np.asarray, art2(XT))
        np.testing.assert_allclose(mean, mean_ref, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(var, var_ref, rtol=1e-7, atol=1e-12)
        # different M, same artifact (shape-polymorphic)
        # (reduction order may differ per concrete shape -> ~1e-9 f64 drift)
        m5, v5 = map(np.asarray, art2(XT[:5]))
        np.testing.assert_allclose(m5, mean[:5], rtol=1e-8)
        np.testing.assert_allclose(v5, var[:5], rtol=1e-7, atol=1e-12)

    def test_matches_frozen_f32(self, trained):
        art = se.export_gpr_predictor(trained)
        pred = freeze_predictor(trained)
        mean_a, var_a = map(np.asarray, art(XT))
        mean_p, var_p = map(np.asarray, pred(XT))
        np.testing.assert_array_equal(mean_a, mean_p)
        np.testing.assert_array_equal(var_a, var_p)
