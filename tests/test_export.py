"""AOT export artifacts (serving_export.py): shape polymorphism, round-trips,
parity with the live pipelines, and cross-process reload without retracing.

The exported programs are the pure-XLA serving paths, so on CPU they must
agree with make_extrap_pipeline / make_lnpi_pipeline (which route to the
same XLA ops off-accelerator) — exactly for the deterministic parts, and
bit-for-bit for the bootstrap when the frequency convention matches
(Poisson(1) tables keyed on the same seed land different draws than the
pipeline's multinomial path, so CI parity is statistical).
"""

from __future__ import annotations

import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from thermoextrap_tpu import pipeline
from thermoextrap_tpu import serving_export as se


def _data(r=257, v=2, seed=0):
    rng = np.random.default_rng(seed)
    uv = (5.0 + rng.normal(size=r)).astype(np.float32)
    xv = (2.0 + 0.4 * rng.normal(size=(r, v))).astype(np.float32)
    return uv, xv


BETAS = np.array([0.8, 1.0, 1.3], np.float32)


def test_extrap_export_matches_pipeline_and_is_polymorphic():
    art = se.export_extrap_pipeline(order=4, beta0=1.0)
    assert set(art.platforms) == {"cpu", "tpu"}
    run = pipeline.make_extrap_pipeline(order=4, beta0=1.0)
    for r in (257, 64):  # one artifact, two sample counts
        uv, xv = _data(r)
        got = np.asarray(art(uv, xv, BETAS))
        want = np.asarray(run(uv, xv, BETAS))
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)
        assert got.shape == (3, 2)


def test_extrap_export_roundtrip_file(tmp_path):
    art = se.export_extrap_pipeline(order=3, beta0=1.0, minus_log=True)
    path = tmp_path / "extrap.thexport"
    art.save(path)
    art2 = se.load_exported(path)
    assert art2.meta == art.meta
    uv, xv = _data(128, 1)
    np.testing.assert_array_equal(
        np.asarray(art(uv, xv, BETAS)), np.asarray(art2(uv, xv, BETAS))
    )


def test_extrap_export_weighted():
    art = se.export_extrap_pipeline(order=3, beta0=1.0, weighted=True)
    run = pipeline.make_extrap_pipeline(order=3, beta0=1.0, weighted=True)
    uv, xv = _data(200)
    w = np.random.default_rng(3).uniform(0.5, 2.0, 200).astype(np.float32)
    got = np.asarray(art(uv, xv, BETAS, weight=w))
    want = np.asarray(run(uv, xv, BETAS, w))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)
    with pytest.raises(ValueError, match="weighted"):
        art(uv, xv, BETAS)


def test_extrap_export_bootstrap_ci():
    nrep = 64
    art = se.export_extrap_pipeline(order=2, beta0=1.0, nrep=nrep)
    uv, xv = _data(4096)
    pred, std = art(uv, xv, BETAS, seed=7)
    pred, std = np.asarray(pred), np.asarray(std)
    assert pred.shape == std.shape == (3, 2)
    assert np.all(std > 0) and np.all(np.isfinite(std))
    # CI magnitude sanity: the mean's bootstrap std at beta0 ~ sem(x)
    sem = xv.std(axis=0) / np.sqrt(len(uv))
    assert np.all(std[1] < 5 * sem) and np.all(std[1] > sem / 5)
    # deterministic in the seed
    _, std2 = art(uv, xv, BETAS, seed=7)
    np.testing.assert_array_equal(std, np.asarray(std2))
    _, std3 = art(uv, xv, BETAS, seed=8)
    assert np.any(np.asarray(std3) != std)


def test_extrap_export_pinned_nval():
    art = se.export_extrap_pipeline(order=2, beta0=1.0, nval=3)
    uv, _ = _data(100)
    xv = np.random.default_rng(5).normal(2, 0.3, (100, 3)).astype(np.float32)
    out = np.asarray(art(uv, xv, BETAS))
    assert out.shape == (3, 3)
    run = pipeline.make_extrap_pipeline(order=2, beta0=1.0)
    np.testing.assert_allclose(out, np.asarray(run(uv, xv, BETAS)), rtol=2e-6)


def test_lnpi_export_matches_pipeline(tmp_path):
    order, beta0 = 3, 0.8
    rng = np.random.default_rng(11)
    grid = (4, 3)
    uv = (10.0 + rng.normal(size=(*grid, 500))).astype(np.float32)
    lnpi0 = rng.normal(size=grid).astype(np.float32)
    mudotn = rng.normal(size=grid).astype(np.float32)
    art = se.export_lnpi_pipeline(order=order, beta0=beta0)
    run = pipeline.make_lnpi_pipeline(order=order, beta0=beta0)
    got = np.asarray(art(uv, lnpi0, mudotn, BETAS))
    want = np.asarray(run(uv, lnpi0, mudotn, BETAS))
    assert got.shape == (3, *grid)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)
    # bootstrap variant: shapes + finiteness + seed determinism
    art_ci = se.export_lnpi_pipeline(order=order, beta0=beta0, nrep=32)
    path = tmp_path / "lnpi.thexport"
    art_ci.save(path)
    art_ci = se.load_exported(path)
    pred, std = art_ci(uv, lnpi0, mudotn, BETAS, seed=3)
    assert np.asarray(pred).shape == np.asarray(std).shape == (3, *grid)
    assert np.all(np.isfinite(np.asarray(std)))
    np.testing.assert_allclose(np.asarray(pred), want, rtol=3e-5, atol=3e-5)


def test_lnpi_export_rejects_order_zero():
    with pytest.raises(ValueError, match="order"):
        se.export_lnpi_pipeline(order=0, beta0=1.0)


def test_load_rejects_foreign_file(tmp_path):
    path = tmp_path / "junk.bin"
    path.write_bytes(b"not an artifact\nat all\nreally")
    with pytest.raises(ValueError, match="artifact"):
        se.load_exported(path)
    # fewer than two newlines must raise the same error, not an unpack crash
    path.write_bytes(b"\x00raw binary, no newlines")
    with pytest.raises(ValueError, match="artifact"):
        se.load_exported(path)


def test_unweighted_artifact_rejects_weight():
    art = se.export_extrap_pipeline(order=2, beta0=1.0)
    uv, xv = _data(16)
    with pytest.raises(ValueError, match="no weight operand"):
        art(uv, xv, BETAS, weight=np.ones(16, np.float32))


def test_cross_process_reload(tmp_path):
    """The artifact must serve from a fresh interpreter with no package
    tracing — the deployment contract.  The child steers jax to CPU
    in-process (CLAUDE.md: env vars are too late under sitecustomize)."""
    art = se.export_extrap_pipeline(order=4, beta0=1.0)
    path = tmp_path / "extrap.thexport"
    art.save(path)
    uv, xv = _data(300)
    np.save(tmp_path / "uv.npy", uv)
    np.save(tmp_path / "xv.npy", xv)
    want = np.asarray(art(uv, xv, BETAS))
    child = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from thermoextrap_tpu.serving_export import load_exported
art = load_exported({str(path)!r})
uv = np.load({str(tmp_path / 'uv.npy')!r})
xv = np.load({str(tmp_path / 'xv.npy')!r})
out = np.asarray(art(uv, xv, np.array([0.8, 1.0, 1.3], np.float32)))
np.save({str(tmp_path / 'out.npy')!r}, out)
print("META", art.meta["family"], art.meta["order"])
"""
    proc = subprocess.run(
        [sys.executable, "-c", child],
        capture_output=True,
        text=True,
        timeout=300,
        check=False,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "META extrap 4" in proc.stdout
    got = np.load(tmp_path / "out.npy")
    np.testing.assert_array_equal(got, want)


def test_bucketed_runner_pads_exactly():
    art = se.export_extrap_pipeline(order=3, beta0=1.0, weighted=True)
    serve = se.bucketed_runner(art, buckets=(64, 256))
    uv, xv = _data(50)
    got = np.asarray(serve(uv, xv, BETAS))  # padded to 64
    want = np.asarray(art(uv, xv, BETAS, weight=np.ones(50, np.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # beyond the largest bucket: exact shape
    uv2, xv2 = _data(300)
    out = np.asarray(serve(uv2, xv2, BETAS))
    assert out.shape == (3, 2)
    with pytest.raises(ValueError, match="at least one sample"):
        serve(uv[:0], xv[:0], BETAS)


def test_bucketed_runner_rejects_unweighted():
    art = se.export_extrap_pipeline(order=2, beta0=1.0)
    with pytest.raises(ValueError, match="weighted=True"):
        se.bucketed_runner(art)


def test_exported_dtype_coercion():
    """f64 inputs (the usual numpy default) are coerced to the exported
    dtype rather than erroring."""
    art = se.export_extrap_pipeline(order=2, beta0=1.0)
    uv, xv = _data(64)
    out = art(uv.astype(np.float64), xv.astype(np.float64), [1.0])
    assert np.asarray(out).shape == (1, 2)
    assert jnp.asarray(out).dtype == jnp.float32


class TestStreamingBundle:
    """Streaming AOT bundles: update/predict programs + init state in one
    file; exported fold == the in-process xla_only pipeline exactly."""

    def test_extrap_bundle_matches_pipeline(self, tmp_path):
        rng = np.random.default_rng(1)
        art = se.export_streaming_extrap_pipeline(
            3, 1.0, nrep=8, weighted=True, val_shape=(2,)
        )
        path = tmp_path / "stream.bin"
        art.save(path)
        art2 = se.load_exported(path)
        assert isinstance(art2, se.StreamingExportedPipeline)
        assert art2.meta["family"] == "streaming_extrap"

        s0, upd, prd = pipeline.make_streaming_extrap_pipeline(
            3, 1.0, nrep=8, val_shape=(2,), xla_only=True
        )
        state, st = art2.init_state(), s0
        for n in (70, 58):  # two chunk SHAPES: update is polymorphic in R
            uv = rng.normal(2.0, 1.0, n).astype(np.float32)
            xv = rng.normal(1.0, 0.3, (n, 2)).astype(np.float32)
            w = rng.uniform(0.5, 1.5, n).astype(np.float32)
            state = art2.update(state, uv, xv, weight=w)
            st = upd(st, uv, xv, weight=w)
        betas = np.array([0.9, 1.1], np.float32)
        for a, b in zip(art2.predict(state, betas), prd(st, betas)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )

    def test_lnpi_bundle_matches_pipeline(self, tmp_path):
        rng = np.random.default_rng(2)
        grid = (4,)
        art = se.export_streaming_lnpi_pipeline(2, 1.0, grid_shape=grid, nrep=4)
        path = tmp_path / "lnpi.bin"
        art.save(path)
        art2 = se.load_exported(path)
        s0, upd, prd = pipeline.make_streaming_lnpi_pipeline(
            2, 1.0, grid_shape=grid, nrep=4, xla_only=True
        )
        state, st = art2.init_state(), s0
        for r in (40, 24):
            uvg = (-10.0 + rng.normal(0, 1, (*grid, r))).astype(np.float32)
            state = art2.update(state, uvg)
            st = upd(st, uvg)
        lnpi0 = np.linspace(0, -2, 4).astype(np.float32)
        mud = (0.5 * np.arange(4)).astype(np.float32)
        betas = np.array([0.9, 1.1], np.float32)
        for a, b in zip(
            art2.predict(state, lnpi0, mud, betas), prd(st, lnpi0, mud, betas)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )

    def test_state_checkpoint_roundtrip(self, tmp_path):
        """Persisting the opaque state tuple with np.savez and resuming
        must continue the fold exactly."""
        rng = np.random.default_rng(3)
        art = se.export_streaming_extrap_pipeline(2, 1.0)
        state = art.update(
            art.init_state(),
            rng.normal(2, 1, 32).astype(np.float32),
            rng.normal(1, 0.2, 32).astype(np.float32),
        )
        np.savez(tmp_path / "ckpt.npz", *state)
        with np.load(tmp_path / "ckpt.npz") as z:
            back = tuple(z[k] for k in z.files)
        uv2 = rng.normal(2, 1, 16).astype(np.float32)
        xv2 = rng.normal(1, 0.2, 16).astype(np.float32)
        a = art.predict(art.update(state, uv2, xv2), np.array([1.0], np.float32))
        b = art.predict(art.update(back, uv2, xv2), np.array([1.0], np.float32))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bf16_bundle_roundtrip(self, tmp_path):
        """ml_dtypes state leaves must survive the file round-trip (plain
        np.savez corrupts bfloat16 to raw void arrays — regression)."""
        rng = np.random.default_rng(7)
        art = se.export_streaming_extrap_pipeline(2, 1.0, dtype=jnp.bfloat16)
        path = tmp_path / "bf16.bin"
        art.save(path)
        art2 = se.load_exported(path)
        state = art2.init_state()
        # the np.savez corruption signature was dtype void16; bfloat16
        # itself has kind "V", so check by name
        assert all("void" not in a.dtype.name for a in state)
        for a, b in zip(state, art.init_state()):
            assert a.dtype == b.dtype
        uv = rng.normal(2, 1, 32).astype(np.float32)
        xv = (2 * uv).astype(np.float32)
        state = art2.update(state, uv, xv)
        out = np.asarray(art2.predict(state, np.array([1.0], np.float32)))
        want = np.asarray(
            art.predict(art.update(art.init_state(), uv, xv),
                        np.array([1.0], np.float32))
        )
        np.testing.assert_array_equal(out, want)
        # dtype-aware checkpoint helpers round-trip bf16 states too
        art2.save_state(tmp_path / "st.bin", state)
        back = art2.load_state(tmp_path / "st.bin")
        for a, b in zip(back, state):
            assert a.dtype == np.asarray(b).dtype
            np.testing.assert_array_equal(a, np.asarray(b))

    def test_update_requires_xv(self):
        art = se.export_streaming_extrap_pipeline(2, 1.0)
        with pytest.raises(ValueError, match="xv"):
            art.update(art.init_state(), np.ones(4, np.float32))

    def test_weight_guards(self):
        rng = np.random.default_rng(4)
        uv = rng.normal(2, 1, 8).astype(np.float32)
        xv = (2 * uv).astype(np.float32)
        art_w = se.export_streaming_extrap_pipeline(2, 1.0, weighted=True)
        with pytest.raises(ValueError, match="weighted=True"):
            art_w.update(art_w.init_state(), uv, xv)
        art_u = se.export_streaming_extrap_pipeline(2, 1.0)
        with pytest.raises(ValueError, match="no weight operand"):
            art_u.update(art_u.init_state(), uv, xv, weight=np.ones(8))

    def test_init_state_is_fresh(self):
        art = se.export_streaming_extrap_pipeline(2, 1.0)
        s1 = art.init_state()
        s2 = art.init_state()
        for a, b in zip(s1, s2):
            assert a is not b
            np.testing.assert_array_equal(a, b)

    def test_cross_process_reload(self, tmp_path):
        """The bundle must serve from a fresh interpreter: init, two
        updates, predict — no package code, no tracing of model source."""
        art = se.export_streaming_extrap_pipeline(2, 1.0)
        path = tmp_path / "stream.thexport"
        art.save(path)
        rng = np.random.default_rng(5)
        uv = rng.normal(2, 1, 48).astype(np.float32)
        xv = (3 * uv + 1).astype(np.float32)
        np.save(tmp_path / "uv.npy", uv)
        np.save(tmp_path / "xv.npy", xv)
        st = art.update(art.init_state(), uv[:30], xv[:30])
        st = art.update(st, uv[30:], xv[30:])
        want = np.asarray(art.predict(st, np.array([1.0, 1.2], np.float32)))
        child = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from thermoextrap_tpu.serving_export import load_exported
art = load_exported({str(path)!r})
uv = np.load({str(tmp_path / 'uv.npy')!r})
xv = np.load({str(tmp_path / 'xv.npy')!r})
st = art.update(art.init_state(), uv[:30], xv[:30])
st = art.update(st, uv[30:], xv[30:])
out = np.asarray(art.predict(st, np.array([1.0, 1.2], np.float32)))
np.save({str(tmp_path / 'out.npy')!r}, out)
print("META", art.meta["family"], art.meta["order"])
"""
        proc = subprocess.run(
            [sys.executable, "-c", child],
            capture_output=True,
            text=True,
            timeout=300,
            check=False,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "META streaming_extrap 2" in proc.stdout
        got = np.load(tmp_path / "out.npy")
        np.testing.assert_array_equal(got, want)


def _xalpha_data(r=257, order=3, seed=0):
    rng = np.random.default_rng(seed)
    uv = (5.0 + rng.normal(size=r)).astype(np.float32)
    base = 2.0 + 0.4 * rng.normal(size=(r, 1))
    xv = np.zeros((r, order + 1, 1), np.float32)
    xv[:, 0] = 2.0 * base
    xv[:, 1] = base
    return uv, xv


def test_extrap_export_xalpha_matches_pipeline():
    order = 3
    art = se.export_extrap_pipeline(order=order, beta0=1.0, xalpha=True)
    run = pipeline.make_extrap_pipeline(order, 1.0, xalpha=True)
    for r in (257, 64):  # polymorphic in R
        uv, xv = _xalpha_data(r, order=order)
        got = np.asarray(art(uv, xv, BETAS))
        want = np.asarray(run(uv, xv, BETAS))
        assert got.shape == (3, 1)
        np.testing.assert_allclose(got, want.reshape(got.shape),
                                   rtol=2e-6, atol=2e-6)


def test_extrap_export_xalpha_shape_guard():
    art = se.export_extrap_pipeline(order=3, beta0=1.0, xalpha=True)
    uv, xv = _xalpha_data(order=3)
    with pytest.raises(ValueError, match="deriv axis"):
        art(uv, xv[:, :3], BETAS)


def test_extrap_export_xalpha_bootstrap_roundtrip(tmp_path):
    order = 3
    art = se.export_extrap_pipeline(
        order=order, beta0=1.0, xalpha=True, nrep=32, minus_log=False
    )
    path = tmp_path / "xalpha.thexport"
    art.save(path)
    art2 = se.load_exported(path)
    uv, xv = _xalpha_data(order=order)
    got = art2(uv, xv, BETAS, seed=5)
    pred, std = (np.asarray(a) for a in got)
    assert pred.shape == std.shape == (3, 1)
    assert np.all(np.isfinite(pred)) and np.all(std > 0)
    np.testing.assert_array_equal(
        pred, np.asarray(art(uv, xv, BETAS, seed=5)[0])
    )


def test_streaming_export_xalpha_matches_inprocess():
    from thermoextrap_tpu.pipeline import make_streaming_extrap_pipeline

    order = 3
    bun = se.export_streaming_extrap_pipeline(
        order=order, beta0=1.0, xalpha=True, val_shape=(1,)
    )
    uv, xv = _xalpha_data(300, order=order)
    st = bun.init_state()
    for lo, hi in [(0, 200), (200, 300)]:
        st = bun.update(st, uv[lo:hi], xv[lo:hi])
    got = np.asarray(bun.predict(st, BETAS))

    state, update, predict = make_streaming_extrap_pipeline(
        order, 1.0, xalpha=True, val_shape=(1,), xla_only=True
    )
    for lo, hi in [(0, 200), (200, 300)]:
        state = update(state, uv[lo:hi], xv[lo:hi])
    want = np.asarray(predict(state, BETAS))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_extrap_export_x_is_u_matches_pipeline():
    art = se.export_extrap_pipeline(order=3, beta0=1.0, x_is_u=True)
    run = pipeline.make_extrap_pipeline(3, 1.0, x_is_u=True)
    for r in (257, 64):  # polymorphic in R
        uv, _ = _data(r)
        got = np.asarray(art(uv, BETAS))
        want = np.asarray(run(uv, BETAS))
        assert got.shape == (3,)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_streaming_export_x_is_u_roundtrip(tmp_path):
    from thermoextrap_tpu.pipeline import make_streaming_extrap_pipeline

    bun = se.export_streaming_extrap_pipeline(
        order=3, beta0=1.0, x_is_u=True, nrep=16
    )
    path = tmp_path / "xisu.thexport"
    bun.save(path)
    bun2 = se.load_exported(path)
    uv, _ = _data(300)
    st = bun2.init_state()
    for lo, hi in [(0, 200), (200, 300)]:
        st = bun2.update(st, uv[lo:hi])
    pred, std = (np.asarray(a) for a in bun2.predict(st, BETAS))
    assert np.all(np.isfinite(pred)) and np.all(std > 0)

    state, update, predict = make_streaming_extrap_pipeline(
        3, 1.0, x_is_u=True, nrep=16, xla_only=True
    )
    for lo, hi in [(0, 200), (200, 300)]:
        state = update(state, uv[lo:hi])
    want_pred, want_std = (np.asarray(a) for a in predict(state, BETAS))
    np.testing.assert_allclose(pred, want_pred, rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(std, want_std, rtol=2e-4, atol=2e-6)

    with pytest.raises(ValueError, match="x_is_u"):
        bun2.update(bun2.init_state(), uv, np.ones((300, 1), np.float32))


def test_bucketed_runner_x_is_u():
    art = se.export_extrap_pipeline(
        order=3, beta0=1.0, x_is_u=True, weighted=True
    )
    serve = se.bucketed_runner(art, buckets=(64, 256))
    uv, _ = _data(50)
    got = np.asarray(serve(uv, BETAS))  # padded to 64
    want = np.asarray(art(uv, BETAS, weight=np.ones(50, np.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert got.shape == (3,)


def test_mbar_export_matches_solver(tmp_path):
    from thermoextrap_tpu.models.mbar import (
        mbar_expectations_grid,
        mbar_solve,
    )

    rng = np.random.default_rng(3)
    sig = np.array([1.0, 1.6, 2.5])
    n = 2000
    xs = np.concatenate([rng.normal(0, s, n) for s in sig])
    u_kn = (xs[None, :] ** 2 / (2 * sig[:, None] ** 2)).astype(np.float64)
    n_k = np.full(3, float(n))
    alphas = np.linspace(0.4, 1.3, 13)  # deliberately not chunk-aligned
    x_n = np.stack([xs, xs**2], 1)

    art = se.export_mbar_reweighter(3, dtype=np.float64)
    f, res, out = art(u_kn, n_k, alphas, u_kn[0], x_n)
    assert float(res) < 1e-10
    f0 = mbar_solve(u_kn, n_k)
    want = mbar_expectations_grid(
        u_kn, n_k, f0, alphas[:, None] * u_kn[0][None, :], x_n
    )
    np.testing.assert_allclose(np.asarray(f), np.asarray(f0), atol=1e-11)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-9)

    # file round-trip + a different (N, A, V) through the same artifact
    path = tmp_path / "mbar.bin"
    art.save(path)
    art2 = se.load_exported(path)
    assert art2.meta["family"] == "mbar"
    m = 3 * n - 7
    f3, _, out3 = art2(
        u_kn[:, :m], n_k, np.linspace(0.5, 1.0, 5), u_kn[0, :m],
        xs[:m, None] ** 2,
    )
    assert np.asarray(out3).shape == (5, 1)
    assert np.all(np.isfinite(np.asarray(out3)))

    with pytest.raises(ValueError, match="K=3"):
        art2(u_kn[:2], n_k[:2], alphas, u_kn[0], x_n)


def test_volume_export_matches_pipeline(tmp_path):
    rng = np.random.default_rng(3)
    r = 257
    wv = (1.0 + 0.4 * rng.normal(size=r)).astype(np.float32)
    xv = (0.5 + 0.3 * wv[:, None] + 0.2 * rng.normal(size=(r, 2))).astype(
        np.float32
    )
    dxdqv = (0.1 * xv + 0.05 * rng.normal(size=(r, 2))).astype(np.float32)
    vols = np.array([1.8, 2.0, 2.3], np.float32)

    art = se.export_volume_pipeline(2.0, ndim=3)
    assert set(art.platforms) == {"cpu", "tpu"}
    run = pipeline.make_volume_pipeline(2.0, ndim=3)
    got = np.asarray(art(wv, xv, dxdqv, vols))
    want = np.asarray(run(wv, xv, dxdqv, vols))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)
    assert got.shape == (3, 2)

    # polymorphic in R and V; scalar observables are accepted bare
    got1 = np.asarray(art(wv[:64], xv[:64, 0], dxdqv[:64, 0], vols))
    assert got1.shape == (3,)

    # weighted + CI round-trips through a file
    art_b = se.export_volume_pipeline(2.0, ndim=3, nrep=50, weighted=True)
    w = rng.uniform(0.5, 1.5, r).astype(np.float32)
    pred, std = art_b(wv, xv, dxdqv, vols, weight=w)
    assert np.all(np.asarray(std) > 0)
    path = tmp_path / "vol.bin"
    art_b.save(path)
    art2 = se.load_exported(path)
    pred2, std2 = art2(wv, xv, dxdqv, vols, weight=w)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(pred2))
    np.testing.assert_array_equal(np.asarray(std), np.asarray(std2))

    with pytest.raises(ValueError, match="weight"):
        art(wv, xv, dxdqv, vols, weight=w)
    with pytest.raises(ValueError, match="must match"):
        art(wv, xv, dxdqv[:, :1], vols)


def test_streaming_volume_bundle_matches_pipeline(tmp_path):
    rng = np.random.default_rng(5)
    r = 4000
    wv = rng.normal(1.0, 0.4, r).astype(np.float32)
    xv = (0.5 + 0.3 * wv + 0.2 * rng.normal(size=r)).astype(np.float32)
    dxdqv = (0.1 * xv + 0.05 * rng.normal(size=r)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, r).astype(np.float32)
    vols = np.array([1.8, 2.0, 2.3], np.float32)

    art = se.export_streaming_volume_pipeline(2.0, ndim=3, weighted=True)
    st = art.init_state()
    st = art.update(st, wv[:1500], xv[:1500], dxdqv=dxdqv[:1500], weight=w[:1500])
    st = art.update(st, wv[1500:], xv[1500:], dxdqv=dxdqv[1500:], weight=w[1500:])
    got = np.asarray(art.predict(st, vols))
    ref = np.asarray(
        pipeline.make_volume_pipeline(2.0, ndim=3, weighted=True)(
            wv, xv, dxdqv, vols, w
        )
    )
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-7)

    # CI bundle round-trips through file + state checkpoint
    art_b = se.export_streaming_volume_pipeline(2.0, ndim=3, nrep=16, seed=9)
    stb = art_b.init_state()
    stb = art_b.update(stb, wv[:1500], xv[:1500], dxdqv=dxdqv[:1500])
    path = tmp_path / "vol_bundle.bin"
    spath = tmp_path / "vol_state.ckpt"
    art_b.save(path)
    art_b.save_state(spath, stb)
    art2 = se.load_exported(path)
    st2 = art2.load_state(spath)
    st2 = art2.update(st2, wv[1500:], xv[1500:], dxdqv=dxdqv[1500:])
    pred, std = art2.predict(st2, vols)
    assert np.all(np.asarray(std) > 0)
    ref_u = np.asarray(
        pipeline.make_volume_pipeline(2.0, ndim=3)(wv, xv, dxdqv, vols)
    )
    np.testing.assert_allclose(np.asarray(pred), ref_u, rtol=2e-6, atol=2e-7)

    # guards: missing dxdqv, foreign-family dxdqv, weight on unweighted
    with pytest.raises(ValueError, match="dxdqv"):
        art_b.update(stb, wv, xv)
    with pytest.raises(ValueError, match="weight"):
        art_b.update(stb, wv, xv, dxdqv=dxdqv, weight=w)
    ext = se.export_streaming_extrap_pipeline(2, 1.0)
    with pytest.raises(ValueError, match="streaming_volume"):
        ext.update(ext.init_state(), wv, xv, dxdqv=dxdqv)


def test_describe_artifact_and_cli(tmp_path):
    """describe_artifact reads only the header (no program deserialization);
    the CLI prints one JSON line per file."""
    import json as _json

    art = se.export_extrap_pipeline(order=2, beta0=1.0, nrep=8)
    p1 = tmp_path / "a.bin"
    art.save(p1)
    bundle = se.export_streaming_volume_pipeline(2.0, ndim=3)
    p2 = tmp_path / "b.bin"
    bundle.save(p2)

    d1 = se.describe_artifact(p1)
    assert d1["family"] == "extrap" and d1["kind"] == "batch"
    assert d1["nrep"] == 8 and d1["file_bytes"] > 0
    d2 = se.describe_artifact(p2)
    assert d2["family"] == "streaming_volume" and d2["kind"] == "streaming"
    assert "_sizes" not in d2 and "_state_spec" not in d2

    with pytest.raises(ValueError, match="not a thermoextrap_tpu"):
        bad = tmp_path / "bad.bin"
        bad.write_bytes(b"nope\n{}\n")
        se.describe_artifact(bad)

    out = subprocess.run(
        [sys.executable, "-m", "thermoextrap_tpu.serving_export",
         str(p1), str(p2)],
        capture_output=True, text=True, check=True,
        cwd=str(tmp_path.parent),
        env={**__import__("os").environ, "PYTHONPATH": str(
            __import__("pathlib").Path(__file__).parent.parent)},
    )
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) == 2
    assert _json.loads(lines[0])["family"] == "extrap"
    assert _json.loads(lines[1])["family"] == "streaming_volume"


def test_perturb_export_matches_pipeline(tmp_path):
    """Perturb artifact == make_perturb_pipeline exactly — including the
    bootstrap std, since BOTH use Poisson(1) tables keyed on the same
    seed (unlike the extrap families' kernel/multinomial split)."""
    art = se.export_perturb_pipeline(1.0, nrep=64)
    run = pipeline.make_perturb_pipeline(1.0, nrep=64)
    for r in (257, 96):  # one artifact, two sample counts
        uv, xv = _data(r)
        pred_a, std_a = art(uv, xv, BETAS, seed=9)
        pred_p, std_p = run(uv, xv, BETAS, seed=9)
        np.testing.assert_allclose(
            np.asarray(pred_a), np.asarray(pred_p), rtol=2e-6, atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(std_a), np.asarray(std_p), rtol=2e-5, atol=2e-6
        )
    # file round-trip
    path = tmp_path / "perturb.thexport"
    art.save(path)
    art2 = se.load_exported(path)
    assert art2.meta["family"] == "perturb"
    uv, xv = _data(128)
    pred_a, _ = art(uv, xv, BETAS, seed=1)
    pred_b, _ = art2(uv, xv, BETAS, seed=1)
    np.testing.assert_allclose(np.asarray(pred_a), np.asarray(pred_b))


def test_perturb_export_weighted_and_guards():
    art_w = se.export_perturb_pipeline(1.0, weighted=True)
    run_w = pipeline.make_perturb_pipeline(1.0, weighted=True)
    uv, xv = _data(200)
    w = np.random.default_rng(3).uniform(0.5, 2.0, 200).astype(np.float32)
    got = np.asarray(art_w(uv, xv, BETAS, weight=w))
    want = np.asarray(run_w(uv, xv, BETAS, w))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)
    with pytest.raises(ValueError, match="weighted=True"):
        art_w(uv, xv, BETAS)
    art_u = se.export_perturb_pipeline(1.0)
    with pytest.raises(ValueError, match="no weight operand"):
        art_u(uv, xv, BETAS, weight=w)
    # scalar-observable squeeze: 1-D xv round-trips as (A,)
    out = np.asarray(art_u(uv, xv[:, 0], BETAS))
    assert out.shape == (3,)


def test_bucketed_runner_perturb_and_volume():
    """bucketed_runner now serves every weighted batch family with exact
    zero-weight padding."""
    art_p = se.export_perturb_pipeline(1.0, weighted=True)
    serve_p = se.bucketed_runner(art_p, buckets=[64, 256])
    uv, xv = _data(100)
    got = np.asarray(serve_p(uv, xv, BETAS))
    want = np.asarray(art_p(uv, xv, BETAS, weight=np.ones(100, np.float32)))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)

    art_v = se.export_volume_pipeline(2.0, ndim=3, weighted=True)
    serve_v = se.bucketed_runner(art_v, buckets=[64, 256])
    rng = np.random.default_rng(5)
    wv = rng.normal(size=100).astype(np.float32)
    xv2 = rng.normal(size=(100, 2)).astype(np.float32)
    dx = rng.normal(size=(100, 2)).astype(np.float32)
    vols = np.array([1.9, 2.1], np.float32)
    got = np.asarray(serve_v(wv, xv2, dx, vols))
    want = np.asarray(art_v(wv, xv2, dx, vols, weight=np.ones(100, np.float32)))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)

    art_u = se.export_perturb_pipeline(1.0)
    with pytest.raises(ValueError, match="weighted=True"):
        se.bucketed_runner(art_u)


def test_streaming_perturb_bundle_matches_inprocess(tmp_path):
    """Streaming perturb bundle == in-process online-softmax pipeline
    (same chunking, same seed -> identical states), predict takes no args."""
    betas = np.array([0.9, 1.0, 1.2], np.float32)
    art = se.export_streaming_perturb_pipeline(
        1.0, betas, val_shape=(2,), nrep=16, seed=3
    )
    path = tmp_path / "sperturb.thexport"
    art.save(path)
    art = se.load_exported(path)
    assert art.meta["family"] == "streaming_perturb"
    assert art.meta["betas"] == pytest.approx([0.9, 1.0, 1.2])

    st_a = art.init_state()
    st_p, update, predict = pipeline.make_streaming_perturb_pipeline(
        1.0, betas, val_shape=(2,), nrep=16, seed=3
    )
    uv, xv = _data(300)
    for lo, hi in ((0, 100), (100, 300)):
        st_a = art.update(st_a, uv[lo:hi], xv[lo:hi])
        st_p = update(st_p, uv[lo:hi], xv[lo:hi])
    pred_a, std_a = art.predict(st_a)
    pred_p, std_p = predict(st_p)
    np.testing.assert_allclose(
        np.asarray(pred_a), np.asarray(pred_p), rtol=2e-6, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(std_a), np.asarray(std_p), rtol=2e-5, atol=2e-6
    )
    with pytest.raises(ValueError, match="takes only"):
        art.predict(st_a, betas)
    # state checkpoint round-trip (includes the -inf max row + int32 step)
    ck = tmp_path / "st.ckpt"
    art.save_state(ck, st_a)
    st_back = art.load_state(ck)
    pred_b, _ = art.predict(st_back)
    np.testing.assert_array_equal(np.asarray(pred_b), np.asarray(pred_a))


def test_streaming_perturb_bundle_weighted(tmp_path):
    """Weighted streaming-perturb bundle: a zero-weight chunk is a no-op
    through the artifact, weights match the in-process pipeline, and the
    missing-xv error names the perturb family (not extrap)."""
    betas = np.array([0.8, 1.1], np.float32)
    art = se.export_streaming_perturb_pipeline(
        1.0, betas, val_shape=(2,), weighted=True
    )
    path = tmp_path / "sperturb_w.thexport"
    art.save(path)
    art = se.load_exported(path)
    assert art.meta["weighted"] is True

    uv, xv = _data(200)
    w = np.linspace(0.5, 2.0, 200).astype(np.float32)
    st = art.update(art.init_state(), uv, xv, weight=w)
    # zero-weight chunk: state advances but the prediction is unchanged
    pred0 = np.asarray(art.predict(st))
    st_z = art.update(st, uv[:64], xv[:64], weight=np.zeros(64, np.float32))
    np.testing.assert_allclose(
        np.asarray(art.predict(st_z)), pred0, rtol=1e-6, atol=1e-7
    )
    # matches the in-process weighted streaming pipeline
    st_p, update, predict = pipeline.make_streaming_perturb_pipeline(
        1.0, betas, val_shape=(2,)
    )
    st_p = update(st_p, uv, xv, w)
    np.testing.assert_allclose(
        pred0, np.asarray(predict(st_p)), rtol=2e-6, atol=2e-6
    )
    # weighted artifact refuses a weightless update, and the missing-xv
    # message is family-aware
    with pytest.raises(ValueError, match="weighted=True"):
        art.update(st, uv, xv)
    with pytest.raises(ValueError, match="perturb streaming update"):
        art.update(st, uv, weight=w)
