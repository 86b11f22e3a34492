"""MBAR solver suite: Newton/self-consistent hybrid, grid expectations,
sharded large-N path.

Reference role: ``pymbar`` inside ``MBARModel``
(/root/reference/src/thermoextrap/models.py:1049-1111); the hybrid solver
mirrors pymbar's production "adaptive" algorithm.  Oracles here are
analytic (harmonic-oscillator free energies) and internal consistency
(hybrid == plain fixed point, sharded == unsharded).
"""

import numpy as np
import pytest

from thermoextrap_tpu.models.mbar import (
    mbar_expectations,
    mbar_expectations_grid,
    mbar_log_weights,
    mbar_solve,
    mbar_solve_info,
)


def _harmonic_problem(sigmas, n, seed=0, dtype=np.float64):
    """K harmonic states u_k(x) = x^2 / (2 sigma_k^2), samples from each.

    Analytic: Z_k = sigma_k sqrt(2 pi)  =>  f_k - f_0 = -log(sigma_k/sigma_0).
    """
    rng = np.random.default_rng(seed)
    xs = np.concatenate([rng.normal(0.0, s, size=n) for s in sigmas])
    sig = np.asarray(sigmas, dtype=dtype)
    u_kn = (xs[None, :] ** 2 / (2.0 * sig[:, None] ** 2)).astype(dtype)
    n_k = np.full(len(sigmas), float(n))
    f_exact = -np.log(sig / sig[0])
    return u_kn, n_k, xs, f_exact


class TestHybridSolver:
    def test_matches_analytic_free_energies(self):
        u_kn, n_k, _, f_exact = _harmonic_problem([1.0, 1.6, 2.5, 4.0], 40000)
        f = np.asarray(mbar_solve(u_kn, n_k))
        # statistical error ~ 1/sqrt(n_eff); generous but non-trivial gate
        np.testing.assert_allclose(f, f_exact, atol=0.03)

    def test_hybrid_equals_fixed_point(self):
        u_kn, n_k, _, _ = _harmonic_problem([1.0, 1.5, 2.2], 3000, seed=1)
        f_h = np.asarray(mbar_solve(u_kn, n_k, method="hybrid", tol=1e-13))
        f_s = np.asarray(mbar_solve(u_kn, n_k, method="sci", tol=1e-14))
        np.testing.assert_allclose(f_h, f_s, atol=1e-10)

    def test_residual_converged_and_fewer_iterations(self):
        # poorly-overlapping states: the plain fixed point crawls, Newton
        # converges in a handful of steps (pymbar's motivation for adaptive)
        u_kn, n_k, _, _ = _harmonic_problem([1.0, 6.0, 30.0], 4000, seed=2)
        f_h, it_h, res_h = mbar_solve_info(u_kn, n_k, tol=1e-12)
        f_s, it_s, res_s = mbar_solve_info(
            u_kn, n_k, tol=1e-12, method="sci", max_iter=20000
        )
        assert float(res_h) <= 1e-12
        assert int(it_h) < 60
        assert int(it_h) * 5 < int(it_s), (int(it_h), int(it_s))
        np.testing.assert_allclose(np.asarray(f_h), np.asarray(f_s), atol=1e-8)

    def test_two_states_known_offset(self):
        # u1 = u0 + c  =>  f1 - f0 = c exactly for ANY sample set
        rng = np.random.default_rng(3)
        x = rng.normal(size=500)
        u0 = 0.5 * np.concatenate([x, x + 0.3]) ** 2
        c = -2.4
        u_kn = np.stack([u0, u0 + c])
        f = np.asarray(mbar_solve(u_kn, np.array([500.0, 500.0])))
        np.testing.assert_allclose(f[1] - f[0], c, rtol=1e-9)

    def test_f32_default_tol_converges(self):
        u_kn, n_k, _, f_exact = _harmonic_problem(
            [1.0, 1.8, 3.0], 20000, seed=4, dtype=np.float32
        )
        f, it, res = mbar_solve_info(u_kn.astype(np.float32), n_k)
        assert np.asarray(f).dtype == np.float32
        assert float(res) <= 1e-5
        np.testing.assert_allclose(np.asarray(f), f_exact, atol=0.05)

    def test_bad_method_raises(self):
        u_kn, n_k, _, _ = _harmonic_problem([1.0, 2.0], 64)
        with pytest.raises(ValueError, match="unknown MBAR method"):
            mbar_solve(u_kn, n_k, method="nope")


class TestGridExpectations:
    def test_grid_matches_per_target_loop(self):
        u_kn, n_k, xs, _ = _harmonic_problem([1.0, 2.0, 3.0], 2000, seed=5)
        f = mbar_solve(u_kn, n_k)
        x_n = np.stack([xs, xs**2], axis=1)  # (N, 2)
        scales = np.array([0.7, 1.0, 1.9])
        u_targets = xs[None, :] ** 2 / (2.0 * scales[:, None] ** 2)
        grid = np.asarray(
            mbar_expectations_grid(u_kn, n_k, f, u_targets, x_n)
        )
        for a in range(len(scales)):
            one = np.asarray(
                mbar_expectations(u_kn, n_k, f, u_targets[a], x_n)
            )
            np.testing.assert_allclose(grid[a], one, rtol=1e-12)

    def test_target_moments_match_analytic(self):
        # reweight to a target harmonic state INSIDE the sampled family:
        # <x^2>_target = sigma_t^2
        u_kn, n_k, xs, _ = _harmonic_problem([1.0, 1.5, 2.5], 60000, seed=6)
        f = mbar_solve(u_kn, n_k)
        sig_t = 1.8
        u_t = xs[None, :] ** 2 / (2.0 * sig_t**2)
        got = np.asarray(
            mbar_expectations_grid(u_kn, n_k, f, u_t, xs[:, None] ** 2)
        )
        np.testing.assert_allclose(got[0, 0], sig_t**2, rtol=0.05)

    def test_log_weights_normalized(self):
        u_kn, n_k, xs, _ = _harmonic_problem([1.0, 2.0], 512, seed=7)
        f = mbar_solve(u_kn, n_k)
        logw = np.asarray(mbar_log_weights(u_kn, n_k, f, u_kn[0]))
        np.testing.assert_allclose(np.exp(logw).sum(), 1.0, rtol=1e-12)


class TestShardedMBAR:
    def test_sharded_solve_equals_single_device(self):
        from thermoextrap_tpu.parallel.sharded import (
            make_mesh,
            mbar_solve_sharded,
        )

        u_kn, n_k, _, _ = _harmonic_problem([1.0, 1.7, 2.6, 3.1], 4096, seed=8)
        mesh = make_mesh(8)
        f_sh, it_sh, res_sh = mbar_solve_sharded(u_kn, n_k, mesh, tol=1e-12)
        f_1, _, _ = mbar_solve_info(u_kn, n_k, tol=1e-12)
        assert float(res_sh) <= 1e-12
        np.testing.assert_allclose(
            np.asarray(f_sh), np.asarray(f_1), atol=1e-11
        )

    def test_sharded_grid_equals_single_device(self):
        from thermoextrap_tpu.parallel.sharded import (
            make_mesh,
            mbar_expectations_grid_sharded,
            mbar_solve_sharded,
        )

        u_kn, n_k, xs, _ = _harmonic_problem([1.0, 2.0, 3.0], 4096, seed=9)
        mesh = make_mesh(8)
        f, _, _ = mbar_solve_sharded(u_kn, n_k, mesh)
        scales = np.array([0.8, 1.4, 2.2, 2.9])
        u_targets = xs[None, :] ** 2 / (2.0 * scales[:, None] ** 2)
        x_n = np.stack([xs, xs**2], axis=1)
        got = np.asarray(
            mbar_expectations_grid_sharded(
                u_kn, n_k, f, u_targets, x_n, mesh
            )
        )
        want = np.asarray(
            mbar_expectations_grid(u_kn, n_k, np.asarray(f), u_targets, x_n)
        )
        np.testing.assert_allclose(got, want, rtol=1e-11)

    def test_uneven_shard_count(self):
        # N not divisible by the mesh size must still be exact — the
        # wrappers zero-weight-pad (log_sample_weight=-inf columns)
        from thermoextrap_tpu.parallel.sharded import (
            make_mesh,
            mbar_expectations_grid_sharded,
            mbar_solve_sharded,
        )

        u_kn, n_k, xs, _ = _harmonic_problem([1.0, 2.0], 501, seed=10)
        mesh = make_mesh(8)
        f_sh, _, _ = mbar_solve_sharded(u_kn, n_k, mesh)
        f_1 = mbar_solve(u_kn, n_k)
        np.testing.assert_allclose(
            np.asarray(f_sh), np.asarray(f_1), atol=1e-11
        )

        u_targets = u_kn[:1] * 0.9
        x_n = xs[:, None] ** 2
        got = np.asarray(
            mbar_expectations_grid_sharded(
                u_kn, n_k, f_1, u_targets, x_n, mesh
            )
        )
        want = np.asarray(
            mbar_expectations_grid(u_kn, n_k, f_1, u_targets, x_n)
        )
        np.testing.assert_allclose(got, want, rtol=1e-11)


class TestUncertainties:
    def test_covariance_matches_bootstrap_fe(self):
        # asymptotic d(f_i - f_j) must agree with a direct bootstrap of the
        # solver over independent redraws (both ~ the true sampling error)
        from thermoextrap_tpu.models.mbar import (
            mbar_covariance,
            mbar_fe_uncertainties,
        )

        sigmas, n = [1.0, 1.8, 3.0], 4000
        u_kn, n_k, _, _ = _harmonic_problem(sigmas, n, seed=20)
        f = mbar_solve(u_kn, n_k)
        dfe = mbar_fe_uncertainties(mbar_covariance(u_kn, n_k, f))

        redraws = np.array(
            [
                np.asarray(
                    mbar_solve(*_harmonic_problem(sigmas, n, seed=100 + s)[:2])
                )
                for s in range(40)
            ]
        )
        emp = redraws.std(axis=0, ddof=1)  # std of f_k - f_0 over redraws
        # k=0 entry is exactly 0 by gauge; compare the others within 2x
        for k in (1, 2):
            assert 0.5 < dfe[0, k] / emp[k] < 2.0, (dfe[0, k], emp[k])

    def test_covariance_gauge_row(self):
        from thermoextrap_tpu.models.mbar import (
            mbar_covariance,
            mbar_fe_uncertainties,
        )

        u_kn, n_k, _, _ = _harmonic_problem([1.0, 2.0], 2000, seed=21)
        f = mbar_solve(u_kn, n_k)
        dfe = mbar_fe_uncertainties(mbar_covariance(u_kn, n_k, f))
        assert dfe.shape == (2, 2)
        np.testing.assert_allclose(np.diag(dfe), 0.0, atol=1e-12)
        assert dfe[0, 1] > 0

    def test_bootstrap_expectations_statistical(self):
        # bootstrap std must track the empirical spread over independent
        # datasets, and the mean must track the plain estimate
        from thermoextrap_tpu.models.mbar import (
            mbar_bootstrap_expectations,
            mbar_expectations_grid,
        )

        sigmas, n = [1.0, 2.0], 3000
        u_kn, n_k, xs, _ = _harmonic_problem(sigmas, n, seed=22)
        f = mbar_solve(u_kn, n_k)
        sig_t = 1.5
        u_t = xs[None, :] ** 2 / (2.0 * sig_t**2)
        x_n = xs[:, None] ** 2
        point = np.asarray(mbar_expectations_grid(u_kn, n_k, f, u_t, x_n))
        mean, std = mbar_bootstrap_expectations(
            u_kn, n_k, u_t, x_n, nrep=48, rep_chunk=8, key=None
        )
        mean, std = np.asarray(mean), np.asarray(std)
        np.testing.assert_allclose(mean, point, rtol=0.02)

        draws = []
        for s in range(24):
            u_s, nk_s, xs_s, _ = _harmonic_problem(sigmas, n, seed=200 + s)
            f_s = mbar_solve(u_s, nk_s)
            ut_s = xs_s[None, :] ** 2 / (2.0 * sig_t**2)
            draws.append(
                np.asarray(
                    mbar_expectations_grid(u_s, nk_s, f_s, ut_s, xs_s[:, None] ** 2)
                )
            )
        emp = float(np.array(draws).std(axis=0, ddof=1).squeeze())
        boot = float(np.asarray(std).squeeze())
        assert 0.4 < boot / emp < 2.5, (boot, emp)

    def test_predict_ci_idealgas(self):
        import thermoextrap_tpu as xtpu
        from thermoextrap_tpu import beta as beta_xpan, idealgas
        from thermoextrap_tpu.models.extrap import MBARModel

        states = []
        for i, b in enumerate([0.8, 1.2]):
            x, u = idealgas.generate_data((3000, 10), b, rng=i)
            data = xtpu.DataValues.from_vals(
                np.asarray(x)[:, None], np.asarray(u), order=0, central=False
            )
            states.append(beta_xpan.factory_extrapmodel(b, data, order=0))
        mbar = MBARModel(states)
        mean, std = mbar.predict_ci(1.0, nrep=32)
        exact = float(idealgas.x_ave(1.0))
        assert abs(float(np.asarray(mean)[0]) - exact) < 0.05
        s = float(np.asarray(std)[0])
        assert 0 < s < 0.05
        # point prediction consistent with the bootstrap mean
        point = float(np.asarray(mbar.predict(1.0))[0])
        assert abs(point - float(np.asarray(mean)[0])) < 4 * s + 1e-3

    def test_perturbed_free_energies_analytic(self):
        from thermoextrap_tpu.models.mbar import (
            mbar_perturbed_free_energies,
        )

        u_kn, n_k, xs, _ = _harmonic_problem([1.0, 1.5, 2.5], 60000, seed=25)
        f = mbar_solve(u_kn, n_k)
        sig_t = np.array([1.2, 1.8, 2.2])
        u_t = xs[None, :] ** 2 / (2.0 * sig_t[:, None] ** 2)
        got = np.asarray(mbar_perturbed_free_energies(u_kn, n_k, f, u_t))
        want = -np.log(sig_t / 1.0)  # f(sigma) - f(sigma_0=1)
        np.testing.assert_allclose(got, want, atol=0.02)
        # consistency: a target equal to a sampled state reproduces its f_k
        same = np.asarray(
            mbar_perturbed_free_energies(u_kn, n_k, f, u_kn[1:2])
        )
        np.testing.assert_allclose(same[0], np.asarray(f)[1], atol=1e-10)

    def test_overlap_matrix(self):
        from thermoextrap_tpu.models.mbar import mbar_overlap

        # well-overlapping pair: rows sum to 1, all entries substantial;
        # disconnected pair: off-diagonal ~ 0
        u_kn, n_k, _, _ = _harmonic_problem([1.0, 1.3], 4000, seed=30)
        f = mbar_solve(u_kn, n_k)
        o = np.asarray(mbar_overlap(u_kn, n_k, f))
        np.testing.assert_allclose(o.sum(axis=1), 1.0, rtol=1e-8)
        assert o.min() > 0.1

        u_kn2, n_k2, _, _ = _harmonic_problem([1.0, 200.0], 4000, seed=31)
        f2 = mbar_solve(u_kn2, n_k2)
        o2 = np.asarray(mbar_overlap(u_kn2, n_k2, f2))
        np.testing.assert_allclose(o2.sum(axis=1), 1.0, rtol=1e-8)
        assert o2[0, 1] < 0.05 and o2[0, 1] < o[0, 1] / 10

    def test_resample_still_raises(self):
        from thermoextrap_tpu.models.extrap import MBARModel

        with pytest.raises(NotImplementedError, match="predict_ci"):
            MBARModel([]).resample(None)


class TestAlphaChunked:
    def test_alphas_matches_grid(self):
        from thermoextrap_tpu.models.mbar import mbar_expectations_alphas

        u_kn, n_k, xs, _ = _harmonic_problem([1.0, 2.0, 3.0], 2000, seed=11)
        f = mbar_solve(u_kn, n_k)
        u_base = xs**2
        alphas = np.linspace(0.3, 1.4, 13)  # deliberately not chunk-aligned
        x_n = np.stack([xs, xs**2], axis=1)
        got = np.asarray(
            mbar_expectations_alphas(
                u_kn, n_k, f, alphas, u_base, x_n, chunk=4
            )
        )
        want = np.asarray(
            mbar_expectations_grid(
                u_kn, n_k, f, alphas[:, None] * u_base[None, :], x_n
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_alphas_jittable(self):
        import jax

        from thermoextrap_tpu.models.mbar import mbar_expectations_alphas

        u_kn, n_k, xs, _ = _harmonic_problem([1.0, 1.5], 512, seed=12)
        f = mbar_solve(u_kn, n_k)
        fn = jax.jit(
            lambda al: mbar_expectations_alphas(
                u_kn, n_k, f, al, xs**2, xs[:, None], chunk=4
            )
        )
        out = np.asarray(fn(np.linspace(0.5, 1.5, 8)))
        assert out.shape == (8, 1) and np.isfinite(out).all()
