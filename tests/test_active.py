"""Active-learning layer tests (reference tests/test_active.py role):
update policies, metrics, StopCriteria, and end-to-end active_learning with
the SimulateIG fake simulator."""

import numpy as np
import pytest

from thermoextrap_tpu.gpr_active import active_utils as au
from thermoextrap_tpu.gpr_active import ig_active, sine_active
from thermoextrap_tpu.gpr_active.gp_models import HeteroscedasticGPR
from thermoextrap_tpu.gpr_active.kernels import RBFDerivKernel

NCONF, NPART = 2_000, 200


@pytest.fixture(scope="module")
def sine_gpr():
    x_vals = np.array([1.0, 2.5, 4.0])
    X, Y, Y_err = sine_active.make_data(x_vals, max_order=2, rng=0)
    model = HeteroscedasticGPR(
        (X, Y, np.diag(Y_err[:, 0])), kernel=RBFDerivKernel(),
        likelihood_kwargs={"p": 1.0},
    )
    model.train(max_iter=300)
    return model, list(x_vals)


@pytest.fixture(scope="module")
def ig_gpr():
    states = [ig_active.extrap_IG(b, rng=i, nconfig=NCONF, npart=NPART)
              for i, b in enumerate([1.0, 2.0])]
    gpr = au.create_GPR(states)
    return gpr, [1.0, 2.0]


class TestInputAssembly:
    def test_input_GP_from_state(self):
        state = ig_active.extrap_IG(1.5, rng=3, nconfig=NCONF, npart=NPART)
        x, y, cov = au.input_GP_from_state(state, n_rep=30)
        assert x.shape == (4, 2)
        assert y.shape == (4, 1)
        assert cov.shape == (1, 4, 4)
        np.testing.assert_array_equal(x[:, 1], np.arange(4))
        # covariance positive on diagonal
        assert np.all(np.diag(cov[0]) > 0)

    def test_log_scale(self):
        state = ig_active.extrap_IG(2.0, rng=4, nconfig=NCONF, npart=NPART)
        x, y, _cov = au.input_GP_from_state(state, n_rep=20, log_scale=True)
        np.testing.assert_allclose(x[:, 0], np.log10(2.0))
        # 1st log-derivative = alpha0 * ln(10) * dy/dalpha
        x2, y2, _ = au.input_GP_from_state(state, n_rep=20)
        np.testing.assert_allclose(
            y[1, 0], y2[1, 0] * 2.0 * np.log(10.0), rtol=1e-7
        )

    def test_log_scale_bell_closed_form(self):
        """The geometric-argument Bell polynomial used by the log-scale
        chain rule has the closed form a^k ln10^n S2(n,k) — gate the
        production closed form against sympy (test-oracle role)."""
        import sympy as sp

        ln10 = np.log(10.0)
        for a in (0.7, 2.3):
            for n in range(1, 8):
                for k in range(1, n + 1):
                    ref = float(
                        sp.bell(
                            n, k, [a * ln10**j for j in range(1, n - k + 2)]
                        )
                    )
                    got = a**k * ln10**n * au._stirling2(n, k)
                    np.testing.assert_allclose(got, ref, rtol=1e-12)

    def test_get_logweights(self):
        bias = np.array([0.0, 1.0, 2.0])
        w = np.exp(au.get_logweights(bias))
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-12)
        assert w[2] > w[0]


class TestUpdates:
    @pytest.mark.parametrize(
        "cls", [au.UpdateALMbrute, au.UpdateRandom, au.UpdateSpaceFill]
    )
    def test_update_policies(self, ig_gpr, cls):
        gpr, alphas = ig_gpr
        upd = cls(rng=0, n_grid=100)
        new_alpha, mu, std = upd(gpr, alphas)
        assert np.min(alphas) <= new_alpha <= np.max(alphas)
        assert np.all(np.isfinite(np.asarray(mu)))

    def test_update_adaptive_integrate(self, ig_gpr):
        gpr, alphas = ig_gpr
        upd = au.UpdateAdaptiveIntegrate(tol=10.0, rng=0, n_grid=100)
        new_alpha, _mu, _std = upd(gpr, alphas)
        assert np.min(alphas) <= new_alpha <= np.max(alphas)

    def test_update_alc(self, ig_gpr):
        gpr, alphas = ig_gpr
        upd = au.UpdateALCbrute(rng=0, n_grid=50, n_candidates=20)
        new_alpha, _mu, _std = upd(gpr, alphas)
        assert np.min(alphas) <= new_alpha <= np.max(alphas)

    def test_alc_hypothetical_cov_in_original_units(self, ig_gpr, monkeypatch):
        """ALC rebuilds hypothetical models from ORIGINAL-unit y, so the
        stored (scale-divided) likelihood.cov must be rescaled by
        scale_fac**2 before it seeds them — capture what reaches
        create_base_GP_model and check the units."""
        gpr, alphas = ig_gpr
        captured = {}
        real = au.create_base_GP_model

        def spy(data, **kws):
            captured.setdefault("cov", np.asarray(data[2]))
            return real(data, **kws)

        monkeypatch.setattr(au, "create_base_GP_model", spy)
        au.UpdateALCbrute(rng=0, n_grid=20, n_candidates=3)(gpr, alphas)
        n = np.asarray(gpr.likelihood.cov).shape[-1]
        want = np.asarray(gpr.likelihood.cov) * (
            np.asarray(gpr.scale_fac).reshape(-1, 1, 1) ** 2
        )
        got = captured["cov"][:, :n, :n]
        np.testing.assert_allclose(got, want, rtol=1e-12)
        # the fixture's model must exercise a nontrivial scale for the
        # test to mean anything
        assert float(np.max(np.asarray(gpr.scale_fac))) != 1.0

    def test_spacefill_midpoint(self, ig_gpr):
        gpr, alphas = ig_gpr
        upd = au.UpdateSpaceFill(rng=0, n_grid=100)
        new_alpha, _m, _s = upd(gpr, alphas)
        np.testing.assert_allclose(new_alpha, 1.5, atol=0.02)


class TestMetrics:
    def fake_history(self):
        mu1 = np.linspace(0.0, 1.0, 10)[:, None]
        mu2 = mu1 + 0.01
        std = np.full_like(mu1, 0.05)
        return [np.stack([mu1, mu2]), np.stack([std, std * 0.5])]

    @pytest.mark.parametrize(
        ("cls", "kws"),
        [
            (au.MaxVar, {}),
            (au.AvgVar, {}),
            (au.MaxRelVar, {}),
            (au.AvgRelVar, {}),
            (au.MaxRelGlobalVar, {}),
            (au.MSD, {}),
            (au.MaxAbsRelDeviation, {}),
            (au.AvgAbsRelDeviation, {}),
            (au.MaxAbsRelGlobalDeviation, {}),
        ],
    )
    def test_metric_values_finite(self, cls, kws):
        m = cls(tol=0.1, **kws)
        val = m(self.fake_history(), None, None)
        assert np.isfinite(val)
        assert val >= 0

    def test_maxiter_never_stops(self):
        m = au.MaxIter()
        assert m(self.fake_history(), None, None) > m.tol

    def test_max_var_value(self):
        h = self.fake_history()
        assert au.MaxVar(tol=1)(h, None, None) == 0.025

    def test_error_stability(self, ig_gpr):
        gpr, _ = ig_gpr
        m = au.ErrorStability(tol=0.1)
        val = m.calc_metric(None, None, gpr)
        assert np.isfinite(val)
        # two states only -> exactly two X locations at order 0... need >2
        # (returns 1.0 when <= 2 points at d_order_pred)


class TestStopCriteria:
    def test_stop_criteria_history(self, ig_gpr):
        gpr, alphas = ig_gpr
        sc = au.StopCriteria([au.MaxRelVar(tol=1e10), au.MaxIter()], n_grid=50)
        stop, metrics = sc(gpr, alphas)
        assert not stop  # MaxIter never passes
        assert "MaxRelVar" in metrics
        assert sc.history[0].shape[0] == 1
        sc(gpr, alphas)
        assert sc.history[0].shape[0] == 2


class TestActiveLearningEndToEnd:
    def test_ig_loop(self, tmp_path):
        sim = ig_active.SimulateIG(nconfig=NCONF, npart=NPART)
        update = au.UpdateALMbrute(rng=1, n_grid=60)
        stop = au.StopCriteria([au.MaxRelGlobalVar(tol=1e-6)], n_grid=60)
        data_list, history = au.active_learning(
            [0.5, 2.0],
            sim,
            update,
            base_dir=str(tmp_path),
            stop_criteria=stop,
            max_iter=2,
            max_order=3,
            save_history=True,
        )
        assert len(data_list) >= 2
        assert len(history["loss"]) >= 1
        assert (tmp_path / "active_history.npz").exists()
        # predictions stored each iteration
        assert stop.history[0].shape[0] == len(history["loss"])
        # npz carries the full training history (reference parity:
        # active_utils.py:2235-2243) and round-trips for warm restarts
        hist = au.load_active_history(tmp_path / "active_history.npz")
        n_it = len(history["loss"])
        assert hist["loss"].shape == (n_it,)
        assert len(hist["params"]) == n_it
        assert hist["params"][-1] == pytest.approx(history["params"][-1])
        assert "MaxRelGlobalVar" in hist
        assert hist["pred_mu"].shape[0] == n_it
        states = [d.build_state(max_order=3) for d in data_list]
        gpr2 = au.create_GPR(states, start_params=hist["params"][-1])
        assert np.isfinite(float(gpr2.neg_lml(gpr2.get_unconstrained())))

    def test_ig_loop_analytical_scale_model(self, tmp_path):
        """gp_base_kwargs plumbs a swapped GP model class through the
        whole loop (the analytical-noise-scale variant)."""
        from thermoextrap_tpu.gpr_active.gp_models import (
            HeteroscedasticGPRAnalyticalScale,
        )

        sim = ig_active.SimulateIG(nconfig=NCONF, npart=NPART)
        update = au.UpdateSpaceFill(rng=2, n_grid=40)
        stop = au.StopCriteria([au.MaxRelGlobalVar(tol=1e-6)], n_grid=40)
        data_list, history = au.active_learning(
            [0.5, 2.0],
            sim,
            update,
            base_dir=str(tmp_path),
            stop_criteria=stop,
            max_iter=1,
            max_order=3,
            gp_base_kwargs={"model_class": HeteroscedasticGPRAnalyticalScale},
        )
        assert len(history["loss"]) >= 1
        assert np.all(np.isfinite(np.asarray(history["loss"])))

    def test_prediction_quality_after_loop(self, tmp_path):
        from thermoextrap_tpu import idealgas

        sim = ig_active.SimulateIG(nconfig=4_000, npart=500)
        update = au.UpdateSpaceFill(rng=2, n_grid=60)
        data_list, _ = au.active_learning(
            [0.5, 2.0],
            sim,
            update,
            base_dir=str(tmp_path),
            max_iter=1,
            max_order=2,
        )
        states = [d.build_state(max_order=2) for d in data_list]
        gpr = au.create_GPR(states)
        xt = np.linspace(0.6, 1.9, 7)
        mu, _var = gpr.predict_f(np.stack([xt, np.zeros_like(xt)], axis=1))
        exact = np.array([float(idealgas.x_ave(b)) for b in xt])
        np.testing.assert_allclose(np.asarray(mu)[:, 0], exact, atol=0.05)


def test_error_stability_full_kl_path():
    """ErrorStability with >= 3 states exercises the full KL/Lambert-W path
    (reference active_utils.py:1799-1936); value must normalize to 1.0 on
    the first call and stay finite/positive afterwards."""
    states = [
        ig_active.extrap_IG(b, rng=10 + i, nconfig=NCONF, npart=NPART)
        for i, b in enumerate([0.6, 1.2, 1.8])
    ]
    gpr = au.create_GPR(states)
    m = au.ErrorStability(tol=0.1)
    v1 = m.calc_metric(None, None, gpr)
    assert v1 == pytest.approx(1.0)  # first call defines the normalization
    v2 = m.calc_metric(None, None, gpr)
    assert np.isfinite(v2) and v2 > 0


def _fake_sim(rep_dir, beta, npart=200, nframes=500):
    """Module-level sim function (must be picklable for multiprocessing):
    writes reference-format sim_info.txt / cv_bias.txt files."""
    import os

    import jax
    import numpy as np

    # spawn children are fresh interpreters and the harness sitecustomize
    # forces jax_platforms="axon,cpu" (env vars are overridden) — steer to
    # CPU in-process or this child blocks on the TPU chip claim whenever
    # the chip is busy (see tests/conftest.py note)
    jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(abs(hash((rep_dir, beta))) % (2**31))
    from thermoextrap_tpu import idealgas

    x, u = idealgas.generate_data((nframes, npart), beta, rng=int(rng.integers(2**31)))
    x = np.asarray(x)
    u = np.asarray(u)
    steps = np.arange(nframes)
    np.savetxt(
        os.path.join(rep_dir, "sim_info.txt"),
        np.stack([steps, np.zeros(nframes), u], axis=1),
    )
    np.savetxt(
        os.path.join(rep_dir, "cv_bias.txt"),
        np.stack([steps, x, np.zeros(nframes)], axis=1),
    )


class TestSimWrapperProcesses:
    def test_run_sim_spawns_and_wraps(self, tmp_path):
        """SimWrapper spawns n_repeats child processes, joins, checks exit
        codes, and wraps the output files (reference active_utils.py:376-454)."""
        sw = au.SimWrapper(_fake_sim, data_kw_inputs={"n_frames": 500})
        dw = sw.run_sim(tmp_path / "beta_1.0", 1.0, n_repeats=2)
        assert isinstance(dw, au.DataWrapper)
        assert len(dw.sim_info_files) == 2
        pot, x, w = dw.get_data()
        assert pot.shape[0] == x.shape[0] == w.shape[0] > 0
        state = dw.build_state(max_order=2)
        pred = float(np.asarray(state.predict(1.0))[0])
        from thermoextrap_tpu import idealgas

        assert abs(pred - float(idealgas.x_ave(1.0))) < 0.05

    def test_failing_sim_raises(self, tmp_path):
        def bad_sim(rep_dir, beta):
            raise RuntimeError("boom")

        # must be picklable -> use a module-level failing function instead
        sw = au.SimWrapper(_failing_sim)
        with pytest.raises(RuntimeError, match="exited with code"):
            sw.run_sim(tmp_path / "beta_2.0", 2.0, n_repeats=1)


def _failing_sim(rep_dir, beta):
    msg = "simulated failure"
    raise RuntimeError(msg)


class TestActiveLearningRestart:
    def test_restart_from_data_wrappers(self, tmp_path):
        """Restart semantics (reference active_utils.py:2133-2144 + file
        persistence): a second active_learning call seeded with the
        DataWrapper list from a previous run continues without re-simulating
        the initial states."""
        sim = ig_active.SimulateIG(nconfig=NCONF, npart=NPART)
        update = au.UpdateSpaceFill(rng=3, n_grid=50)

        data_list, _ = au.active_learning(
            [0.5, 2.0], sim, update, base_dir=str(tmp_path), max_iter=1,
            max_order=2,
        )
        n_first = len(data_list)
        counter_after_first = sim._counter

        # restart: pass DataWrappers (not floats) -> no new initial sims
        data_list2, history2 = au.active_learning(
            data_list, sim, update, base_dir=str(tmp_path), max_iter=1,
            max_order=2,
        )
        assert len(data_list2) >= n_first
        # exactly one new simulation (the acquisition), none for init states
        assert sim._counter == counter_after_first + 1
        assert len(history2["loss"]) >= 1
