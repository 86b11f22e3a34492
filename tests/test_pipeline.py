"""One-dispatch serving pipeline == the eager model workflow."""

import jax.numpy as jnp
import numpy as np
import pytest

import thermoextrap_tpu as xtpu
from thermoextrap_tpu import beta
from thermoextrap_tpu.pipeline import make_extrap_pipeline, make_lnpi_pipeline


def _model(u, x, order, beta0, minus_log=False):
    data = xtpu.factory_data_values(
        uv=np.asarray(u), xv=np.asarray(x), order=order, central=True
    )
    return beta.factory_extrapmodel(beta0, data, minus_log=minus_log)


def test_pipeline_matches_model(rng_np):
    order, beta0, R = 4, 2.0, 5000
    u = rng_np.normal(3.0, 0.7, R)
    x = 1.5 + 0.2 * (u - 3.0) + rng_np.normal(0, 0.3, R)
    betas = np.array([1.8, 2.0, 2.3])

    run = make_extrap_pipeline(order, beta0)
    got = np.asarray(run(u, x, betas))
    ref = np.asarray(_model(u, x, order, beta0).predict(betas))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_pipeline_minus_log(rng_np):
    order, beta0, R = 3, 1.0, 3000
    u = rng_np.normal(2.0, 0.5, R)
    x = np.exp(0.5 + 0.1 * (u - 2.0)) + rng_np.uniform(0.1, 0.2, R)
    betas = np.array([0.9, 1.1])

    run = make_extrap_pipeline(order, beta0, minus_log=True)
    got = np.asarray(run(u, x, betas))
    ref = np.asarray(_model(u, x, order, beta0, minus_log=True).predict(betas))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_pipeline_vector_observable(rng_np):
    order, beta0, R, V = 3, 2.0, 2000, 3
    u = rng_np.normal(3.0, 0.7, R)
    x = 1.5 + 0.2 * (u[:, None] - 3.0) + rng_np.normal(0, 0.3, (R, V))
    betas = np.array([1.9, 2.1])

    run = make_extrap_pipeline(order, beta0)
    got = np.asarray(run(u, x, betas))
    assert got.shape == (2, V)
    ref = np.asarray(_model(u, x, order, beta0).predict(betas))
    np.testing.assert_allclose(got, ref.reshape(got.shape), rtol=1e-10)


def test_pipeline_bootstrap_std(rng_np):
    """The in-jit bootstrap std is calibrated against the eager resample
    path (different draws -> statistical comparison)."""
    order, beta0, R, nrep = 2, 2.0, 4000, 200
    u = rng_np.normal(3.0, 0.7, R)
    x = 1.5 + 0.2 * (u - 3.0) + rng_np.normal(0, 0.3, R)
    betas = np.array([1.9, 2.2])

    run = make_extrap_pipeline(order, beta0, nrep=nrep)
    pred, std = run(u, x, betas, seed=3)
    pred, std = np.asarray(pred), np.asarray(std)

    model = _model(u, x, order, beta0)
    np.testing.assert_allclose(
        pred, np.asarray(model.predict(betas)), rtol=1e-10
    )
    boot = model.resample({"nrep": nrep})
    ref_std = np.asarray(boot.predict(betas)).std(axis=1)
    ratio = std / ref_std
    assert np.all((0.6 < ratio) & (ratio < 1.7)), ratio

    # different seeds -> different draws, same calibration
    _, std2 = run(u, x, betas, seed=4)
    assert not np.allclose(np.asarray(std2), std)
    assert np.all(np.abs(np.asarray(std2) / std - 1.0) < 0.5)


def test_pipeline_sharded(rng_np):
    """mesh= pipeline == unsharded pipeline exactly (8 virtual devices)."""
    import jax
    import pytest

    from thermoextrap_tpu.parallel import make_mesh, shard_rec

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    order, beta0, R, nrep = 3, 2.0, 4096, 16
    u = rng_np.normal(3.0, 0.7, R)
    x = 1.5 + 0.2 * (u - 3.0) + rng_np.normal(0, 0.3, R)
    betas = np.array([1.9, 2.2])

    mesh = make_mesh(8, axis_names=("rep", "rec"))
    run_m = make_extrap_pipeline(order, beta0, nrep=nrep, mesh=mesh)
    run_1 = make_extrap_pipeline(order, beta0)

    us = shard_rec(jnp.asarray(u), mesh)
    xs = shard_rec(jnp.asarray(x), mesh)
    pred_m, std_m = run_m(us, xs, betas, seed=5)
    pred_1 = run_1(u, x, betas)
    np.testing.assert_allclose(
        np.asarray(pred_m), np.asarray(pred_1), rtol=1e-12
    )
    assert np.all(np.asarray(std_m) > 0)


def test_pipeline_weighted(rng_np):
    """weighted=True pipeline == the eager weighted data path."""
    order, beta0, R, nrep = 3, 2.0, 3000, 100
    u = rng_np.normal(3.0, 0.7, R)
    x = 1.5 + 0.2 * (u - 3.0) + rng_np.normal(0, 0.3, R)
    w = rng_np.uniform(0.5, 1.5, R)
    betas = np.array([1.9, 2.2])

    run = make_extrap_pipeline(order, beta0, weighted=True, nrep=nrep)
    pred, std = run(u, x, betas, w, seed=2)

    data = xtpu.factory_data_values(
        uv=np.asarray(u), xv=np.asarray(x), weight=np.asarray(w),
        order=order, central=True,
    )
    model = beta.factory_extrapmodel(beta0, data)
    np.testing.assert_allclose(
        np.asarray(pred), np.asarray(model.predict(betas)), rtol=1e-10
    )
    boot = model.resample({"nrep": nrep})
    ref_std = np.asarray(boot.predict(betas)).std(axis=1)
    ratio = np.asarray(std) / ref_std
    assert np.all((0.6 < ratio) & (ratio < 1.7)), ratio


def test_lnpi_pipeline_matches_model(rng_np):
    """One-dispatch lnPi grid pipeline == the eager moment-backed model."""
    from thermoextrap_tpu import lnpi
    from thermoextrap_tpu.utils.trees import replace

    order, beta0, n_grid, R = 3, 1.4, 7, 3000
    # per-macrostate energy streams with a grid-dependent mean
    shift = np.linspace(-2.0, 2.0, n_grid)
    uv = shift[:, None] + rng_np.normal(-10.0, 1.5, (n_grid, R))
    lnpi0 = rng_np.normal(0.0, 1.0, n_grid)
    lnpi0 -= lnpi0[0]
    mu = 0.7
    ncoords = np.arange(n_grid, dtype=float)
    mudotn = mu * ncoords

    run = make_lnpi_pipeline(order, beta0)
    betas = np.array([1.2, 1.4, 1.6])
    got = np.asarray(run(uv, lnpi0, mudotn, betas))
    assert got.shape == (3, n_grid)

    # eager reference: moment-backed data (exact f64 raw moments) + factory
    u_raw = np.stack(
        [(np.float64(uv) ** n).mean(axis=-1) for n in range(order + 1)]
    )
    data = xtpu.DataCentralMoments.from_ave_raw(
        u=u_raw, xu=None, x_is_u=True, central=True
    )
    meta = lnpi.lnPiDataCallback.from_mu(
        lnPi0=lnpi0, mu=[mu], ncoords=ncoords[None, :]
    )
    model = lnpi.factory_extrapmodel_lnPi(beta0, replace(data, meta=meta))
    ref = np.asarray(model.predict(betas))
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-10)


def test_pipeline_is_differentiable(rng_np):
    import jax

    order, beta0, R = 2, 1.0, 500
    u = jnp.asarray(rng_np.normal(2.0, 0.5, R))
    x = jnp.asarray(1.0 + 0.3 * (u - 2.0) + rng_np.normal(0, 0.1, R))
    run = make_extrap_pipeline(order, beta0)

    g = jax.grad(lambda uu: run(uu, x, jnp.asarray([1.2])).sum())(u)
    assert g.shape == u.shape
    assert bool(jnp.all(jnp.isfinite(g)))


def test_lnpi_pipeline_bootstrap_std(rng_np):
    """nrep>0: CI from the shared-freq grid bootstrap; std positive, scales
    like 1/sqrt(R), and the mean path is unchanged."""
    order, beta0, n_grid, R = 3, 1.4, 5, 2000
    uv = np.linspace(-1, 1, n_grid)[:, None] + rng_np.normal(
        -10.0, 1.5, (n_grid, R)
    )
    lnpi0 = rng_np.normal(0.0, 1.0, n_grid)
    mudotn = 0.7 * np.arange(n_grid, dtype=float)
    betas = np.array([1.2, 1.6])

    run0 = make_lnpi_pipeline(order, beta0)
    run = make_lnpi_pipeline(order, beta0, nrep=64)
    pred0 = np.asarray(run0(uv, lnpi0, mudotn, betas))
    pred, std = run(uv, lnpi0, mudotn, betas, seed=1)
    pred, std = np.asarray(pred), np.asarray(std)
    np.testing.assert_allclose(pred, pred0, rtol=1e-12)
    assert std.shape == pred.shape
    assert np.all(std > 0)
    # lnΠ at β0 has zero-variance coefficient 0 only; extrapolated points
    # carry moment noise ~ 1/sqrt(R): crude magnitude sanity
    assert np.all(std < 1.0)


def test_lnpi_pipeline_sharded(rng_np):
    """mesh= lnPi pipeline == unsharded freq-table path exactly (same seed
    -> same freq table on both paths)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from thermoextrap_tpu.parallel import make_mesh

    order, beta0, n_grid, R, nrep = 3, 1.4, 5, 1024, 16
    uv = np.linspace(-1, 1, n_grid)[:, None] + rng_np.normal(
        -10.0, 1.5, (n_grid, R)
    )
    lnpi0 = rng_np.normal(0.0, 1.0, n_grid)
    mudotn = 0.7 * np.arange(n_grid, dtype=float)
    betas = np.array([1.2, 1.6])

    mesh = make_mesh(8, axis_names=("rep", "rec"))
    run_m = make_lnpi_pipeline(order, beta0, nrep=nrep, mesh=mesh)
    run_u = make_lnpi_pipeline(order, beta0, nrep=nrep)

    uv_s = jax.device_put(
        jnp.asarray(uv), NamedSharding(mesh, P(None, "rec"))
    )
    pm, sm = run_m(uv_s, lnpi0, mudotn, betas, seed=3)
    pu, su = run_u(uv, lnpi0, mudotn, betas, seed=3)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pu), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sm), np.asarray(su), rtol=1e-8)


def test_pipeline_bf16_flag_cpu_noop(rng_np):
    """bf16=True is gated to accelerator backends: on CPU the pipeline
    must compute identically to bf16=False (no silent bf16 XLA math)."""
    order, beta0, R = 3, 1.0, 512
    u = rng_np.normal(2.0, 0.5, R)
    x = (1.0 + 0.3 * (u - 2.0))[:, None]
    betas = np.array([1.1, 1.3])
    p0 = np.asarray(make_extrap_pipeline(order, beta0)(u, x, betas))
    p1 = np.asarray(make_extrap_pipeline(order, beta0, bf16=True)(u, x, betas))
    np.testing.assert_array_equal(p0, p1)


def test_gpr_pipeline_serving(rng_np):
    """make_gpr_pipeline: trained-once GPR + bucketed compile-once predict.

    Ragged query sizes must return the same per-point posterior as a direct
    ``predict_f`` call (the bucket pad is repeat-last-point and sliced off),
    and the GP mean must interpolate the training observable to a few
    percent."""
    from thermoextrap_tpu.pipeline import make_gpr_pipeline

    order, R = 2, 4000
    states = []
    for b in (0.6, 1.0, 1.6):
        u = rng_np.normal(3.0 / b, 0.5, R)
        x = 1.0 / b + 0.1 * (u - u.mean()) + rng_np.normal(0, 0.05, R)
        states.append(_model(u, x, order, b))

    gpr, predict = make_gpr_pipeline(states, bucket=8)

    alphas = np.array([0.8, 1.0, 1.4])
    mean, var = predict(alphas)
    assert mean.shape == (3, 1) and var.shape == (3, 1)
    assert np.all(var > 0)
    # GP mean at a training alpha ~ training observable
    np.testing.assert_allclose(mean[1, 0], 1.0, rtol=0.1)

    # ragged sizes hit the same bucketed program and agree pointwise with
    # the direct (unpadded) predict_f path
    x_new = np.column_stack([alphas, np.zeros(3)])
    m_ref, v_ref = gpr.predict_f(x_new)
    np.testing.assert_allclose(mean, np.asarray(m_ref), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(var, np.asarray(v_ref), rtol=1e-8, atol=1e-10)
    m5, _ = predict(np.linspace(0.7, 1.5, 5))
    np.testing.assert_allclose(m5[3, 0], predict(np.array([1.3]))[0][0, 0], rtol=1e-8)

    import pytest

    with pytest.raises(ValueError):
        predict(alphas, order=1)


class TestBucketedRunner:
    def test_padding_is_exact(self, rng_np):
        from thermoextrap_tpu.pipeline import (
            make_bucketed_extrap_runner,
            make_extrap_pipeline,
        )

        uv = rng_np.normal(2.0, 1.0, 1000)
        xv = rng_np.normal(1.0, 0.5, (1000, 2))
        betas = np.array([1.8, 2.0, 2.2])
        serve = make_bucketed_extrap_runner(4, 2.0, buckets=(1 << 9, 1 << 11))
        run = make_extrap_pipeline(4, 2.0)
        got = np.asarray(serve(uv, xv, betas))
        want = np.asarray(run(uv, xv, betas))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)

    def test_bucket_selection_and_overflow(self):
        from thermoextrap_tpu.pipeline import make_bucketed_extrap_runner

        serve = make_bucketed_extrap_runner(2, 1.0, buckets=(8, 32))
        assert serve.buckets == (8, 32)
        uv = np.linspace(0.5, 1.5, 100)  # above largest bucket: one-off shape
        out = serve(uv, uv[:, None] * 2, np.array([1.0]))
        np.testing.assert_allclose(np.asarray(out)[0, 0], np.mean(2 * uv), rtol=1e-12)

    def test_weighted_and_bootstrap(self, rng_np):
        from thermoextrap_tpu.pipeline import make_bucketed_extrap_runner

        uv = rng_np.normal(2.0, 1.0, 700)
        xv = rng_np.normal(1.0, 0.5, (700, 1))
        w = rng_np.uniform(0.5, 1.5, 700)
        serve = make_bucketed_extrap_runner(3, 2.0, buckets=(1 << 10,), nrep=32)
        pred, std = serve(uv, xv, np.array([2.0, 2.1]), weight=w, seed=3)
        assert np.isfinite(np.asarray(pred)).all()
        assert (np.asarray(std) > 0).all()

    def test_warmup_compiles_buckets(self):
        from thermoextrap_tpu.pipeline import make_bucketed_extrap_runner

        serve = make_bucketed_extrap_runner(2, 1.0, buckets=(8, 16))
        serve.warmup(val_shape=(1,), n_betas=2)

    def test_bucket_pad_tuple_streams(self, rng_np):
        """bucket_pad pads several value streams together (volume runner's
        (xv, dxdqv) pair) identically to padding each alone."""
        from thermoextrap_tpu.pipeline import bucket_pad

        uv = rng_np.normal(0.0, 1.0, 100)
        xv = rng_np.normal(0.0, 1.0, (100, 2))
        dx = rng_np.normal(0.0, 1.0, (100, 2))
        buckets = (128,)
        up, (xp, dp), wp = bucket_pad(uv, (xv, dx), None, buckets)
        up1, xp1, wp1 = bucket_pad(uv, xv, None, buckets)
        _, dp1, _ = bucket_pad(uv, dx, None, buckets)
        np.testing.assert_array_equal(up, up1)
        np.testing.assert_array_equal(xp, xp1)
        np.testing.assert_array_equal(dp, dp1)
        np.testing.assert_array_equal(wp, wp1)
        assert up.shape == (128,) and xp.shape == (128, 2)
        # no pad needed: streams come back unchanged
        u2, (x2, d2), _ = bucket_pad(uv, (xv, dx), None, (100,))
        np.testing.assert_array_equal(x2, xv)
        np.testing.assert_array_equal(d2, dx)
        # sharp edges rejected loudly (ADVICE r4: an empty tuple used to
        # come back as xv=None and TypeError at the caller's unpack)
        with pytest.raises(ValueError, match="may not be empty"):
            bucket_pad(uv, (), None, buckets)
        with pytest.raises(ValueError, match="may not contain None"):
            bucket_pad(uv, (xv, None), None, buckets)

    def test_f64_weights_not_downcast(self, rng_np):
        from thermoextrap_tpu.pipeline import (
            make_bucketed_extrap_runner,
            make_extrap_pipeline,
        )

        uv = rng_np.normal(2.0, 1.0, 500)
        xv = rng_np.normal(1.0, 0.5, (500, 1))
        w = rng_np.uniform(0.5, 1.5, 500)  # float64
        serve = make_bucketed_extrap_runner(3, 2.0, buckets=(1 << 10,))
        run = make_extrap_pipeline(3, 2.0, weighted=True)
        got = np.asarray(serve(uv, xv, np.array([2.1]), weight=w))
        want = np.asarray(run(uv, xv, np.array([2.1]), w))
        np.testing.assert_allclose(got, want, rtol=1e-13, atol=0)


class TestXalphaPipeline:
    """β-dependent observables (tutorial cases 2/4) through the serving
    pipelines: the deriv columns ride the kernels as extra value columns,
    only the coefficient assembly differs (central_x_ave_coefs_xalpha)."""

    @staticmethod
    def _data(rng_np, order, R=3000, v=()):
        u = rng_np.normal(3.0, 0.7, R)
        base = 1.5 + 0.2 * (u - 3.0) + rng_np.normal(0, 0.3, R)
        # observable "2*x with an explicit x β-derivative column":
        # deriv columns [2x, x, 0, ...]
        xv = np.zeros((R, order + 1, *v))
        b = base.reshape(R, *([1] * len(v)))
        xv[:, 0] = 2.0 * b
        xv[:, 1] = b
        return u, xv

    @staticmethod
    def _model(u, xv, order, beta0, minus_log=False):
        data = xtpu.factory_data_values(
            uv=np.asarray(u),
            xv=np.asarray(xv),
            order=order,
            central=True,
            xalpha=True,
        )
        return beta.factory_extrapmodel(beta0, data, minus_log=minus_log)

    def test_matches_model(self, rng_np):
        order, beta0 = 4, 2.0
        u, xv = self._data(rng_np, order, v=(1,))
        betas = np.array([1.8, 2.0, 2.3])
        run = make_extrap_pipeline(order, beta0, xalpha=True)
        got = np.asarray(run(u, xv, betas))
        ref = np.asarray(self._model(u, xv, order, beta0).predict(betas))
        np.testing.assert_allclose(got, ref.reshape(got.shape), rtol=1e-10)

    def test_minus_log(self, rng_np):
        order, beta0 = 3, 2.0
        u, xv = self._data(rng_np, order, v=(1,))
        betas = np.array([1.9, 2.2])
        run = make_extrap_pipeline(order, beta0, xalpha=True, minus_log=True)
        got = np.asarray(run(u, xv, betas))
        ref = np.asarray(
            self._model(u, xv, order, beta0, minus_log=True).predict(betas)
        )
        np.testing.assert_allclose(got, ref.reshape(got.shape), rtol=1e-10)

    def test_bootstrap_calibrated(self, rng_np):
        order, beta0, nrep = 2, 2.0, 200
        u, xv = self._data(rng_np, order, R=4000, v=(1,))
        betas = np.array([1.9, 2.2])
        run = make_extrap_pipeline(order, beta0, xalpha=True, nrep=nrep)
        pred, std = run(u, xv, betas, seed=3)
        model = self._model(u, xv, order, beta0)
        np.testing.assert_allclose(
            np.asarray(pred).ravel(),
            np.asarray(model.predict(betas)).ravel(),
            rtol=1e-10,
        )
        boot = model.resample({"nrep": nrep})
        ref_std = np.asarray(boot.predict(betas)).std(axis=1)
        ratio = np.asarray(std).ravel() / ref_std.ravel()
        assert np.all((0.6 < ratio) & (ratio < 1.7)), ratio

    def test_sharded_matches_unsharded(self, rng_np):
        import jax
        import pytest

        from thermoextrap_tpu.parallel import make_mesh, shard_rec

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        order, beta0 = 3, 2.0
        u, xv = self._data(rng_np, order, R=4096, v=(1,))
        betas = np.array([1.9, 2.2])
        mesh = make_mesh(8, axis_names=("rep", "rec"))
        run_m = make_extrap_pipeline(order, beta0, xalpha=True, nrep=16, mesh=mesh)
        run_1 = make_extrap_pipeline(order, beta0, xalpha=True)
        pred_m, std_m = run_m(
            shard_rec(jnp.asarray(u), mesh), shard_rec(jnp.asarray(xv), mesh), betas
        )
        pred_1 = run_1(u, xv, betas)
        np.testing.assert_allclose(
            np.asarray(pred_m), np.asarray(pred_1), rtol=1e-12
        )
        assert np.all(np.asarray(std_m) > 0)

    def test_deriv_axis_shape_error(self, rng_np):
        import pytest

        order, beta0 = 3, 2.0
        u, xv = self._data(rng_np, order, v=(1,))
        run = make_extrap_pipeline(order, beta0, xalpha=True)
        with pytest.raises(ValueError, match="deriv axis"):
            run(u, xv[:, :order], np.array([2.0]))

    def test_bucketed_runner(self, rng_np):
        from thermoextrap_tpu.pipeline import make_bucketed_extrap_runner

        order, beta0 = 3, 2.0
        u, xv = self._data(rng_np, order, R=700, v=(1,))
        betas = np.array([1.9, 2.2])
        serve = make_bucketed_extrap_runner(
            order, beta0, xalpha=True, buckets=(1 << 10,)
        )
        serve.warmup(val_shape=(1,))
        got = np.asarray(serve(u, xv, betas))
        ref = np.asarray(self._model(u, xv, order, beta0).predict(betas))
        np.testing.assert_allclose(got, ref.reshape(got.shape), rtol=1e-10)


class TestXisUPipeline:
    """<u>(β) serving (reference u_ave observable, beta.py:303-321) from
    the u-moment kernels at half the stream traffic."""

    @staticmethod
    def _model(u, order, beta0, minus_log=False, weight=None):
        data = xtpu.factory_data_values(
            uv=np.asarray(u), xv=None, order=order, central=True,
            x_is_u=True, weight=weight,
        )
        return beta.factory_extrapmodel(
            beta0, data, name="u_ave", minus_log=minus_log
        )

    def test_matches_model(self, rng_np):
        order, beta0 = 4, 2.0
        u = rng_np.normal(3.0, 0.7, 5000)
        betas = np.array([1.8, 2.0, 2.3])
        run = make_extrap_pipeline(order, beta0, x_is_u=True)
        got = np.asarray(run(u, betas))
        ref = np.asarray(self._model(u, order, beta0).predict(betas))
        assert got.shape == (3,)
        np.testing.assert_allclose(got, ref.reshape(got.shape), rtol=1e-10)

    def test_minus_log_weighted(self, rng_np):
        order, beta0 = 3, 2.0
        u = np.abs(rng_np.normal(3.0, 0.7, 4000)) + 1.0
        w = rng_np.uniform(0.5, 1.5, 4000)
        betas = np.array([1.9, 2.2])
        run = make_extrap_pipeline(
            order, beta0, x_is_u=True, minus_log=True, weighted=True
        )
        got = np.asarray(run(u, betas, w))
        ref = np.asarray(
            self._model(u, order, beta0, minus_log=True, weight=w).predict(
                betas
            )
        )
        np.testing.assert_allclose(got, ref.reshape(got.shape), rtol=1e-10)

    def test_bootstrap_calibrated(self, rng_np):
        order, beta0, nrep = 2, 2.0, 200
        u = rng_np.normal(3.0, 0.7, 4000)
        betas = np.array([1.9, 2.2])
        run = make_extrap_pipeline(order, beta0, x_is_u=True, nrep=nrep)
        pred, std = run(u, betas, seed=3)
        model = self._model(u, order, beta0)
        np.testing.assert_allclose(
            np.asarray(pred).ravel(),
            np.asarray(model.predict(betas)).ravel(),
            rtol=1e-10,
        )
        boot = model.resample({"nrep": nrep})
        ref_std = np.asarray(boot.predict(betas)).std(axis=1).ravel()
        ratio = np.asarray(std).ravel() / ref_std
        assert np.all((0.6 < ratio) & (ratio < 1.7)), ratio

    def test_sharded_matches_unsharded(self, rng_np):
        import jax
        import pytest

        from thermoextrap_tpu.parallel import make_mesh, shard_rec

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        order, beta0 = 3, 2.0
        u = rng_np.normal(3.0, 0.7, 4096)
        betas = np.array([1.9, 2.2])
        mesh = make_mesh(8, axis_names=("rep", "rec"))
        run_m = make_extrap_pipeline(
            order, beta0, x_is_u=True, nrep=16, mesh=mesh
        )
        run_1 = make_extrap_pipeline(order, beta0, x_is_u=True)
        pred_m, std_m = run_m(shard_rec(jnp.asarray(u), mesh), betas)
        pred_1 = run_1(u, betas)
        np.testing.assert_allclose(
            np.asarray(pred_m), np.asarray(pred_1), rtol=1e-12
        )
        assert np.all(np.asarray(std_m) > 0)

    def test_mutually_exclusive_with_xalpha(self):
        import pytest

        with pytest.raises(ValueError, match="mutually exclusive"):
            make_extrap_pipeline(3, 2.0, x_is_u=True, xalpha=True)

    def test_bucketed_runner(self, rng_np):
        from thermoextrap_tpu.pipeline import make_bucketed_extrap_runner

        order, beta0 = 3, 2.0
        u = rng_np.normal(3.0, 0.7, 700)
        betas = np.array([1.9, 2.2])
        serve = make_bucketed_extrap_runner(
            order, beta0, x_is_u=True, buckets=(1 << 10,)
        )
        serve.warmup()
        got = np.asarray(serve(u, betas))
        ref = np.asarray(self._model(u, order, beta0).predict(betas))
        np.testing.assert_allclose(got, ref.reshape(got.shape), rtol=1e-10)


class TestVolumePipeline:
    """make_volume_pipeline == the eager volume.factory_extrapmodel path."""

    @staticmethod
    def _data(rng_np, R=4000, vec=False):
        wv = rng_np.normal(1.0, 0.4, R)
        if vec:
            xv = 0.5 + 0.3 * wv[:, None] + rng_np.normal(0, 0.2, (R, 2))
            dxdqv = 0.1 * xv + rng_np.normal(0, 0.05, (R, 2))
        else:
            xv = 0.5 + 0.3 * wv + rng_np.normal(0, 0.2, R)
            dxdqv = 0.1 * xv + rng_np.normal(0, 0.05, R)
        return wv, xv, dxdqv

    def test_matches_model(self, rng_np):
        from thermoextrap_tpu import volume
        from thermoextrap_tpu.pipeline import make_volume_pipeline

        wv, xv, dxdqv = self._data(rng_np)
        v0, nd = 2.0, 3
        vols = np.array([1.8, 2.0, 2.3])
        run = make_volume_pipeline(v0, ndim=nd)
        got = np.asarray(run(wv, xv, dxdqv, vols))
        model = volume.factory_extrapmodel(v0, wv, xv, dxdqv, ndim=nd)
        np.testing.assert_allclose(
            got, np.asarray(model.predict(vols)).reshape(got.shape), rtol=1e-10
        )

    def test_vector_observable(self, rng_np):
        from thermoextrap_tpu import volume
        from thermoextrap_tpu.pipeline import make_volume_pipeline

        wv, xv, dxdqv = self._data(rng_np, vec=True)
        v0, nd = 2.0, 2
        vols = np.array([1.9, 2.1])
        run = make_volume_pipeline(v0, ndim=nd)
        got = np.asarray(run(wv, xv, dxdqv, vols))
        assert got.shape == (2, 2)
        model = volume.factory_extrapmodel(v0, wv, xv, dxdqv, ndim=nd)
        np.testing.assert_allclose(
            got, np.asarray(model.predict(vols)).reshape(got.shape), rtol=1e-10
        )

    def test_bootstrap_calibrated(self, rng_np):
        from thermoextrap_tpu import volume
        from thermoextrap_tpu.pipeline import make_volume_pipeline

        wv, xv, dxdqv = self._data(rng_np)
        v0, nd, nrep = 2.0, 3, 200
        vols = np.array([1.8, 2.3])
        run = make_volume_pipeline(v0, ndim=nd, nrep=nrep)
        pred, std = run(wv, xv, dxdqv, vols, seed=3)
        model = volume.factory_extrapmodel(v0, wv, xv, dxdqv, ndim=nd)
        np.testing.assert_allclose(
            np.asarray(pred),
            np.asarray(model.predict(vols)).reshape(np.asarray(pred).shape),
            rtol=1e-10,
        )
        boot = model.resample({"nrep": nrep})
        ref_std = np.asarray(boot.predict(vols)).std(axis=1)
        ratio = np.asarray(std) / ref_std
        assert np.all((0.6 < ratio) & (ratio < 1.7)), ratio
        # different seeds -> different draws, same calibration
        _, std2 = run(wv, xv, dxdqv, vols, seed=4)
        assert not np.allclose(np.asarray(std2), np.asarray(std))

    def test_weighted(self, rng_np):
        from thermoextrap_tpu import volume
        from thermoextrap_tpu.pipeline import make_volume_pipeline

        wv, xv, dxdqv = self._data(rng_np)
        w = rng_np.uniform(0.5, 1.5, len(wv))
        v0, nd = 2.0, 3
        vols = np.array([1.9, 2.2])
        run = make_volume_pipeline(v0, ndim=nd, weighted=True)
        got = np.asarray(run(wv, xv, dxdqv, vols, w))
        model = volume.factory_extrapmodel(
            v0, wv, xv, dxdqv, ndim=nd, weight=np.asarray(w)
        )
        np.testing.assert_allclose(
            got, np.asarray(model.predict(vols)).reshape(got.shape), rtol=1e-10
        )

    def test_sharded_matches_unsharded(self, rng_np):
        import jax
        import pytest

        from thermoextrap_tpu.parallel import make_mesh, shard_rec
        from thermoextrap_tpu.pipeline import make_volume_pipeline

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        wv, xv, dxdqv = self._data(rng_np, R=4096)
        v0, nd, nrep = 2.0, 3, 16
        vols = np.array([1.9, 2.2])
        mesh = make_mesh(8, axis_names=("rep", "rec"))
        run_m = make_volume_pipeline(v0, ndim=nd, nrep=nrep, mesh=mesh)
        run_1 = make_volume_pipeline(v0, ndim=nd)
        ws = shard_rec(jnp.asarray(wv), mesh)
        xs = shard_rec(jnp.asarray(xv), mesh)
        ds = shard_rec(jnp.asarray(dxdqv), mesh)
        pred_m, std_m = run_m(ws, xs, ds, vols, seed=5)
        pred_1 = run_1(wv, xv, dxdqv, vols)
        np.testing.assert_allclose(
            np.asarray(pred_m), np.asarray(pred_1), rtol=1e-12
        )
        assert np.all(np.asarray(std_m) > 0)

    def test_shape_mismatch_error(self, rng_np):
        import pytest

        from thermoextrap_tpu.pipeline import make_volume_pipeline

        wv, xv, _ = self._data(rng_np, R=100)
        run = make_volume_pipeline(2.0)
        with pytest.raises(ValueError, match="must match"):
            run(wv, xv, np.zeros((100, 3)), np.array([2.0]))


class TestPerturbPipeline:
    """make_perturb_pipeline == PerturbModel.predict; weighted / CI /
    sharded legs."""

    def _data(self, rng_np, R=4000, V=None):
        u = rng_np.normal(2.0, 0.5, R)
        shape = (R,) if V is None else (R, V)
        x = 1.5 + 0.3 * (u.reshape(R, *([1] * (len(shape) - 1))) - 2.0) + rng_np.normal(
            0, 0.2, shape
        )
        return u, x.reshape(shape)

    def test_matches_perturb_model(self, rng_np):
        from thermoextrap_tpu.models.extrap import PerturbModel
        from thermoextrap_tpu.pipeline import make_perturb_pipeline

        u, x = self._data(rng_np)
        betas = np.array([0.9, 1.0, 1.15])
        run = make_perturb_pipeline(1.0)
        got = np.asarray(run(u, x, betas))

        class _D:
            uv = jnp.asarray(u)
            xv = jnp.asarray(x)

        ref = np.asarray(PerturbModel(1.0, _D()).predict(betas))
        np.testing.assert_allclose(got, ref, rtol=1e-12)

    def test_vector_observable_and_at_beta0(self, rng_np):
        from thermoextrap_tpu.pipeline import make_perturb_pipeline

        u, x = self._data(rng_np, V=3)
        run = make_perturb_pipeline(1.0)
        got = np.asarray(run(u, x, np.array([1.0, 1.1])))
        assert got.shape == (2, 3)
        # at beta0 the weights are uniform: plain mean
        np.testing.assert_allclose(got[0], x.mean(axis=0), rtol=1e-12)

    def test_all_zero_weights_yield_nan_not_poison(self, rng_np):
        """Fully zero-weight input: weights collapse to exact zeros (the
        streaming finite-mask convention), so the prediction is the 0/0
        NaN from the normalization — never exp(-inf - -inf) NaN inside
        the matmul."""
        from thermoextrap_tpu.pipeline import _perturb_weights, make_perturb_pipeline

        u, x = self._data(rng_np, R=64)
        e = np.asarray(
            _perturb_weights(jnp.asarray(u), jnp.array([0.1, -0.1]), np.zeros(64))
        )
        np.testing.assert_array_equal(e, np.zeros_like(e))
        run = make_perturb_pipeline(1.0, weighted=True)
        out = np.asarray(run(u, x, np.array([0.9, 1.1]), np.zeros(64)))
        assert np.isnan(out).all()

    def test_weighted_zero_pad_exact(self, rng_np):
        """Zero-weight padded samples change nothing (bucket-pad seam)."""
        from thermoextrap_tpu.pipeline import make_perturb_pipeline

        u, x = self._data(rng_np, R=1000)
        betas = np.array([0.95, 1.1])
        w = rng_np.uniform(0.5, 2.0, 1000)
        run_w = make_perturb_pipeline(1.0, weighted=True)
        base = np.asarray(run_w(u, x, betas, w))
        up = np.concatenate([u, rng_np.normal(0, 1, 64)])
        xp = np.concatenate([x, rng_np.normal(0, 1, 64)])
        wp = np.concatenate([w, np.zeros(64)])
        padded = np.asarray(run_w(up, xp, betas, wp))
        np.testing.assert_allclose(padded, base, rtol=1e-12)

    def test_poisson_mode_validation_and_cpu_fallback(self, rng_np):
        """poisson= accepts table/device only; on CPU (no Pallas PRNG)
        the device mode falls back to the table path — identical results
        at equal seed."""
        import pytest

        from thermoextrap_tpu.pipeline import make_perturb_pipeline

        with pytest.raises(ValueError, match="table.*device"):
            make_perturb_pipeline(1.0, poisson="hardware")
        u, x = self._data(rng_np, R=500)
        betas = np.array([0.9, 1.1])
        p_t, s_t = make_perturb_pipeline(1.0, nrep=16, poisson="table")(
            u, x, betas, seed=3
        )
        p_d, s_d = make_perturb_pipeline(1.0, nrep=16, poisson="device")(
            u, x, betas, seed=3
        )
        np.testing.assert_array_equal(np.asarray(p_t), np.asarray(p_d))
        np.testing.assert_array_equal(np.asarray(s_t), np.asarray(s_d))

    def test_empty_value_axis(self, rng_np):
        """Degenerate V=0 keeps the old matmul semantics (empty (A, 0)
        predictions) instead of crashing the small-V reduce path."""
        from thermoextrap_tpu.pipeline import make_perturb_pipeline

        u, _ = self._data(rng_np, R=64)
        out = np.asarray(
            make_perturb_pipeline(1.0)(u, np.zeros((64, 0)), np.array([0.9, 1.1]))
        )
        assert out.shape == (2, 0)

    def test_bootstrap_std_calibrated(self, rng_np):
        """CI from the Poisson freq-matmul path tracks the eager
        resample-the-model bootstrap statistically."""
        from thermoextrap_tpu.models.extrap import PerturbModel
        from thermoextrap_tpu.ops.resample import (
            freq_from_indices,
            random_indices,
        )
        from thermoextrap_tpu.pipeline import make_perturb_pipeline

        import jax as _jax

        u, x = self._data(rng_np, R=3000)
        betas = np.array([1.08])
        nrep = 300
        run = make_perturb_pipeline(1.0, nrep=nrep)
        pred, std = run(u, x, betas, seed=3)
        assert np.all(np.asarray(std) > 0)

        # eager reference: index-resample the samples, re-predict
        class _D:
            uv = jnp.asarray(u)
            xv = jnp.asarray(x)

        model = PerturbModel(1.0, _D())
        idx = np.asarray(
            random_indices(_jax.random.key(7), nrep, u.shape[0])
        )
        reps = np.stack(
            [
                np.asarray(
                    PerturbModel(
                        1.0,
                        type(
                            "D",
                            (),
                            {"uv": jnp.asarray(u[i]), "xv": jnp.asarray(x[i])},
                        )(),
                    ).predict(betas)
                )
                for i in idx[:60]
            ]
        )
        ref_std = reps.std(axis=0)
        ratio = np.asarray(std) / ref_std
        assert np.all(ratio > 0.5) and np.all(ratio < 2.0)
        np.testing.assert_allclose(
            np.asarray(pred), np.asarray(model.predict(betas)), rtol=1e-12
        )

    def test_mesh_equals_unsharded(self, rng_np):
        import jax
        import pytest

        from thermoextrap_tpu.parallel import make_mesh
        from thermoextrap_tpu.pipeline import make_perturb_pipeline

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        u, x = self._data(rng_np, R=4096, V=2)
        betas = np.array([0.9, 1.05])
        mesh = make_mesh(8, axis_names=("rec",))
        run_m = make_perturb_pipeline(1.0, nrep=32, mesh=mesh)
        run_1 = make_perturb_pipeline(1.0, nrep=32)
        pred_m, std_m = run_m(u, x, betas, seed=11)
        pred_1, std_1 = run_1(u, x, betas, seed=11)
        np.testing.assert_allclose(
            np.asarray(pred_m), np.asarray(pred_1), rtol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(std_m), np.asarray(std_1), rtol=1e-8
        )
