"""Adaptive / recursive interpolation trainers (reference test role:
tests/test_recursive_interp + adaptive parts of test suite)."""

import numpy as np
import pytest

from thermoextrap_tpu import adaptive_interp, beta as beta_xpan, idealgas
from thermoextrap_tpu.models.extrap import InterpModel, InterpModelPiecewise
from thermoextrap_tpu.recursive_interp import RecursiveInterp

ORDER = 2


def small_state(beta, rng=None, nrep=40):
    return adaptive_interp.factory_state_idealgas(
        beta, ORDER, nrep=nrep, nconfig=2_000, npart=500, rng=rng
    )


class TestTrainIterative:
    def test_converges_and_predicts(self):
        alphas = np.linspace(0.5, 2.0, 31)
        model, info = adaptive_interp.train_iterative(
            alphas,
            factory_state=small_state,
            factory_statecollection=InterpModel,
            maxiter=5,
            tol=0.01,
            state_kws={"rng": 7},
        )
        assert model is not None
        assert 1 <= len(info) <= 5
        # prediction near the analytic answer at an interior point
        pred = np.asarray(model.predict(1.2)).mean()  # mean over reps
        exact = float(idealgas.x_ave(1.2))
        assert abs(pred - exact) < 0.02

    def test_callback_stops(self):
        alphas = np.linspace(0.5, 2.0, 11)
        calls = []

        def cb(model, alphas, info, **kws):
            calls.append(info["depth"])
            return True

        _model, info = adaptive_interp.train_iterative(
            alphas,
            factory_state=small_state,
            factory_statecollection=InterpModel,
            maxiter=5,
            callback=cb,
            state_kws={"rng": 3},
        )
        assert len(info) == 1
        assert calls == [0]


class TestTrainRecursive:
    def test_runs(self):
        alphas = np.linspace(0.5, 2.0, 31)
        states, info = adaptive_interp.train_recursive(
            alphas,
            factory_state=small_state,
            factory_statecollection=InterpModel,
            maxiter=4,
            tol=0.02,
            state_kws={"rng": 11},
        )
        assert len(states) >= 2
        assert all(
            states[i].alpha0 <= states[i + 1].alpha0 for i in range(len(states) - 1)
        )
        model = InterpModelPiecewise(states)
        pred = np.asarray(model.predict(1.0)).mean()
        assert abs(pred - float(idealgas.x_ave(1.0))) < 0.05


def test_check_polynomial_consistency():
    states = [small_state(b, rng=i) for i, b in enumerate([0.5, 1.0, 1.5, 2.0])]
    ps, models = adaptive_interp.check_polynomial_consistency(
        states, InterpModel
    )
    assert len(models) == 3 + 2  # adjacent pairs + skip pairs
    for p in ps.values():
        assert np.all((0.0 <= p) & (p <= 1.0))


class TestRecursiveInterp:
    @pytest.fixture(scope="class")
    def trained(self):
        derivs = beta_xpan.factory_derivatives("x_ave", central=False)
        ri = RecursiveInterp(
            InterpModel,
            derivs,
            edge_beta=[0.5, 2.0],
            max_order=ORDER,
            tol=0.02,
            rng=5,
            nrep=40,
        )

        # smaller data for test speed
        def get_data(beta):
            import thermoextrap_tpu as xtpu

            import jax

            ri.rng, sub = jax.random.split(ri.rng)
            x, u = idealgas.generate_data((2_000, 500), beta, rng=sub)
            return xtpu.factory_data_values(
                uv=np.asarray(u), xv=np.asarray(x), order=ORDER
            )

        ri.get_data = get_data
        ri.recursive_train(0.5, 2.0, recurse_max=6)
        return ri

    def test_predict(self, trained):
        betas = np.array([0.7, 1.3, 1.9])
        pred = trained.predict(betas)[:, 0] if trained.predict(betas).ndim > 1 else trained.predict(betas)
        exact = np.array([float(idealgas.x_ave(b)) for b in betas])
        np.testing.assert_allclose(np.squeeze(pred), exact, atol=0.03)

    def test_out_of_bounds(self, trained):
        with pytest.raises(IndexError):
            trained.predict([0.1])

    def test_poly_consistency(self, trained):
        if len(trained.states) <= 2:
            pytest.skip("no interior states added")
        pvals = trained.check_poly_consistency()
        for p in pvals:
            assert np.all((0.0 <= p) & (p <= 1.0))

    def test_sequential_train(self):
        derivs = beta_xpan.factory_derivatives("x_ave", central=False)
        ri = RecursiveInterp(
            InterpModel, derivs, edge_beta=[0.6, 1.8], max_order=ORDER, rng=8
        )

        def get_data(beta):
            import thermoextrap_tpu as xtpu
            import jax

            ri.rng, sub = jax.random.split(ri.rng)
            x, u = idealgas.generate_data((2_000, 500), beta, rng=sub)
            return xtpu.factory_data_values(
                uv=np.asarray(u), xv=np.asarray(x), order=ORDER
            )

        ri.get_data = get_data
        ri.sequential_train([0.6, 1.2, 1.8])
        assert len(ri.states) == 3
        pred = ri.predict([1.0])
        assert abs(float(np.squeeze(pred)) - float(idealgas.x_ave(1.0))) < 0.05


class TestPlottingCallbacks:
    """Canned matplotlib demo callbacks (reference adaptive_interp.py:550-635)."""

    def test_callback_plot_progress(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        alphas = np.linspace(0.5, 2.0, 11)
        _fig, ax = plt.subplots()
        model, info = adaptive_interp.train_iterative(
            alphas,
            factory_state=small_state,
            factory_statecollection=InterpModel,
            maxiter=2,
            callback=adaptive_interp.callback_plot_progress,
            callback_kws={
                "ax": ax,
                "verbose": False,
                "exact": idealgas.x_ave,
                "maxdepth_stop": 0,
            },
            state_kws={"rng": 5},
        )
        assert model is not None
        assert len(ax.lines) >= 2  # prediction + exact overlay
        # maxdepth_stop=0 stops via the callback at depth 1 at the latest
        assert len(info) <= 2
        plt.close("all")

    def test_plot_polynomial_consistency(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        alphas = np.linspace(0.5, 2.0, 16)
        states = [small_state(b, rng=i) for i, b in enumerate((0.5, 1.2, 2.0))]
        _fig, ax = plt.subplots()
        ps, models = adaptive_interp.plot_polynomial_consistency(
            alphas, states, InterpModel, ax=ax, verbose=False
        )
        assert len(ps) == 3  # (01,12), (01,02), (12,02)
        assert all(np.all((0 <= np.asarray(p)) & (np.asarray(p) <= 1)) for p in ps.values())
        assert len(ax.lines) >= 3
        plt.close("all")
