"""Native C++ fast table loader vs np.loadtxt."""

import numpy as np
import pytest

from thermoextrap_tpu.native import loadtxt_fast


@pytest.fixture
def table_file(tmp_path, rng_np):
    data = np.concatenate(
        [
            rng_np.normal(scale=1e3, size=(500, 3)),
            rng_np.normal(scale=1e-7, size=(500, 3)),
        ]
    )
    path = tmp_path / "table.txt"
    with path.open("w") as f:
        f.write("# comment line\n")
        np.savetxt(f, data)
        f.write("# trailing comment\n")
    return path, data


def test_matches_numpy(table_file):
    path, data = table_file
    a = loadtxt_fast(path)
    b = np.loadtxt(path)
    np.testing.assert_allclose(a, b, rtol=5e-16)
    np.testing.assert_allclose(a, data, rtol=1e-10)


def test_single_column(tmp_path, rng_np):
    data = rng_np.normal(size=1000)
    path = tmp_path / "col.txt"
    np.savetxt(path, data)
    a = loadtxt_fast(path)
    assert a.ndim == 1
    np.testing.assert_allclose(a, data, rtol=5e-16)


def test_usecols_matches_numpy(table_file):
    path, _data = table_file
    # scalar, list-of-one, and multi-column selections follow np.loadtxt
    np.testing.assert_allclose(
        loadtxt_fast(path, usecols=1), np.loadtxt(path, usecols=1), rtol=5e-16
    )
    np.testing.assert_allclose(
        loadtxt_fast(path, usecols=[2]), np.loadtxt(path, usecols=[2]), rtol=5e-16
    )
    np.testing.assert_allclose(
        loadtxt_fast(path, usecols=[0, 2]),
        np.loadtxt(path, usecols=[0, 2]),
        rtol=5e-16,
    )


def test_usecols_out_of_range_raises(tmp_path, rng_np):
    # a single-column table must NOT silently satisfy usecols=2
    path = tmp_path / "col.txt"
    np.savetxt(path, rng_np.normal(size=50))
    with pytest.raises(Exception):  # noqa: B017 - np.loadtxt raises ValueError, fast path IndexError
        loadtxt_fast(path, usecols=2)


def test_int_and_exponent_formats(tmp_path):
    path = tmp_path / "mixed.txt"
    path.write_text("1 2.5 -3e2\n4.0E-3 +5 6.25d1\n")
    a = loadtxt_fast(path)
    np.testing.assert_allclose(
        a, [[1.0, 2.5, -300.0], [0.004, 5.0, 62.5]], rtol=1e-15
    )


def test_datawrapper_uses_fastloader(tmp_path, rng_np):
    from thermoextrap_tpu.gpr_active.active_utils import DataWrapper

    n = 400
    u = rng_np.normal(5.0, 1.0, n)
    cv = rng_np.normal(1.0, 0.2, n)
    info = np.stack([np.arange(n), np.zeros(n), u], axis=1)
    cvb = np.stack([np.arange(n), cv, np.zeros(n)], axis=1)
    np.savetxt(tmp_path / "sim_info.txt", info)
    np.savetxt(tmp_path / "cv_bias.txt", cvb)

    dw = DataWrapper(
        [str(tmp_path / "sim_info.txt")],
        [str(tmp_path / "cv_bias.txt")],
        beta=1.0,
        n_frames=n,
        cv_cols=[1, 2],
    )
    pot, x, w = dw.get_data()
    assert pot.shape[0] == x.shape[0] == w.shape[0]
    state = dw.build_state(max_order=2)
    assert state.order == 2
    assert np.isfinite(np.asarray(state.derivs())).all()


# ---------------------------------------------------------------------------
# native C++ moments engine (cmoments.cpp) vs the XLA implementations
# ---------------------------------------------------------------------------

from thermoextrap_tpu import native
from thermoextrap_tpu.ops import dispatch, moments, resample


@pytest.fixture
def flat_samples(rng_np):
    R = 777
    uv = rng_np.normal(3.0, 1.0, R)
    xv = rng_np.normal(0.5, 2.0, (R, 3))
    w = rng_np.uniform(0.2, 1.5, R)
    return uv, xv, w


def test_engine_available():
    assert native.available()


def test_reduce_central_matches_xla(flat_samples):
    uv, xv, w = flat_samples
    got = native.reduce_central_comoments(uv, xv, 6, weight=w)
    want = moments.reduce_central_comoments(uv, xv, 6, weight=w)
    for g, e in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(e), rtol=1e-12, atol=1e-14)
    # exact conventions
    assert got[2][0] == 1.0 and got[2][1] == 0.0
    np.testing.assert_array_equal(got[3][0], 0.0)


def test_reduce_central_unweighted_scalar_val(flat_samples):
    uv, xv, _ = flat_samples
    got = native.reduce_central_comoments(uv, xv[:, :1], 4)
    want = moments.reduce_central_comoments(uv, xv[:, :1], 4)
    for g, e in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(e), rtol=1e-12, atol=1e-14)


def test_reduce_central_batched_matches_xla(rng_np):
    uv = rng_np.normal(1.0, 0.5, (2, 3, 250))
    xv = rng_np.normal(0.0, 1.0, (2, 3, 250, 2))
    w = rng_np.uniform(0.5, 1.0, (2, 3, 250))
    got = native.reduce_central_comoments(uv, xv, 5, weight=w)
    want = moments.reduce_central_comoments(uv, xv, 5, weight=w)
    for g, e in zip(got, want):
        assert g.shape == np.asarray(e).shape
        np.testing.assert_allclose(g, np.asarray(e), rtol=1e-12, atol=1e-14)


def test_reduce_raw_matches_xla(flat_samples):
    uv, xv, w = flat_samples
    got = native.reduce_raw_comoments(uv, xv, 6, weight=w)
    want = moments.reduce_raw_comoments(uv, xv, 6, weight=w)
    for g, e in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(e), rtol=1e-11)


def test_resample_matches_xla(flat_samples, rng_np):
    uv, xv, w = flat_samples
    nrep, R = 16, uv.shape[0]
    idx = rng_np.integers(0, R, (nrep, R))
    freq = np.zeros((nrep, R), dtype=np.int64)
    np.add.at(freq, (np.repeat(np.arange(nrep), R), idx.ravel()), 1)
    got = native.resample_central_comoments(uv, xv, freq, 4, weight=w)
    want = resample.resample_central_comoments(uv, xv, freq, 4, weight=w)
    for g, e in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(e), rtol=1e-9, atol=1e-12)


def test_resample_zero_replicate_degenerate_standin(flat_samples):
    # an all-zero frequency row must produce the XLA path's stand-in
    # (global means, trivial central moments), not an error or NaN
    uv, xv, w = flat_samples
    freq = np.ones((3, uv.shape[0]))
    freq[1] = 0.0
    got = native.resample_central_comoments(uv, xv, freq, 3, weight=w)
    want = resample.resample_central_comoments(uv, xv, freq, 3, weight=w)
    for g, e in zip(got, want):
        assert np.isfinite(g).all()
        np.testing.assert_allclose(g, np.asarray(e), rtol=1e-9, atol=1e-12)


def test_zero_total_weight_matches_xla_nan_convention(flat_samples):
    uv, xv, _ = flat_samples
    w0 = np.zeros_like(uv)
    got = native.reduce_central_comoments(uv, xv, 3, weight=w0)
    want = moments.reduce_central_comoments(uv, xv, 3, weight=w0)
    for g, e in zip(got, want):
        e = np.asarray(e)
        np.testing.assert_array_equal(np.isnan(g), np.isnan(e))
        np.testing.assert_allclose(g[~np.isnan(g)], e[~np.isnan(e)], rtol=1e-12)
    # raw path: NaN everywhere, like XLA
    u, xu = native.reduce_raw_comoments(uv, xv, 3, weight=w0)
    assert np.isnan(u).all() and np.isnan(xu).all()


def test_resample_zero_total_weight_matches_xla_nan_convention(flat_samples):
    # a GLOBALLY zero-weight stream must poison every replicate with the
    # XLA 0/0 pattern (NaN except pinned du[0]/du[1]/dxdu[0]) — not the
    # finite trivial moments of a single degenerate replicate
    uv, xv, _ = flat_samples
    w0 = np.zeros_like(uv)
    freq = np.ones((3, uv.shape[0]))
    got = native.resample_central_comoments(uv, xv, freq, 4, weight=w0)
    want = resample.resample_central_comoments(uv, xv, freq, 4, weight=w0)
    for g, e in zip(got, want):
        e = np.asarray(e)
        np.testing.assert_array_equal(np.isnan(g), np.isnan(e))
        np.testing.assert_allclose(g[~np.isnan(g)], e[~np.isnan(e)], rtol=1e-12)


def test_zero_weight_batch_row_nans_that_row_only(rng_np):
    # one unvisited bin in a batched grid must not poison the others
    uv = rng_np.normal(1.0, 0.5, (3, 200))
    xv = rng_np.normal(0.0, 1.0, (3, 200, 1))
    w = np.ones((3, 200))
    w[1] = 0.0
    got = native.reduce_central_comoments(uv, xv, 3, weight=w)
    want = moments.reduce_central_comoments(uv, xv, 3, weight=w)
    for g, e in zip(got, want):
        e = np.asarray(e)
        np.testing.assert_array_equal(np.isnan(g), np.isnan(e))
        np.testing.assert_allclose(
            g[~np.isnan(g)], e[~np.isnan(e)], rtol=1e-12, atol=1e-14
        )


def test_dispatch_native_routing(flat_samples):
    import jax
    import jax.numpy as jnp

    uv, xv, w = flat_samples
    dispatch.set_impl("native")
    try:
        got = dispatch.reduce_central(uv, xv, 4, weight=w)
        # concrete call served by the C++ engine -> numpy outputs
        assert all(isinstance(g, np.ndarray) for g in got)
        want = moments.reduce_central_comoments(uv, xv, 4, weight=w)
        for g, e in zip(got, want):
            np.testing.assert_allclose(g, np.asarray(e), rtol=1e-12, atol=1e-14)

        # traced call falls through to XLA (native cannot run under jit)
        jitted = jax.jit(
            lambda u, x: dispatch.reduce_central(u, x, 4, weight=None)[2]
        )
        du_jit = jitted(jnp.asarray(uv), jnp.asarray(xv))
        du_eager = moments.reduce_central_comoments(uv, xv, 4)[2]
        np.testing.assert_allclose(
            np.asarray(du_jit), np.asarray(du_eager), rtol=1e-12
        )
    finally:
        dispatch.set_impl(None)


def test_dispatch_native_resample_and_raw(flat_samples, rng_np):
    uv, xv, w = flat_samples
    freq = rng_np.poisson(1.0, (8, uv.shape[0])).astype(np.float64)
    dispatch.set_impl("native")
    try:
        got = dispatch.resample_central(uv, xv, freq, 3, weight=w)
        want = resample.resample_central_comoments(uv, xv, freq, 3, weight=w)
        for g, e in zip(got, want):
            np.testing.assert_allclose(g, np.asarray(e), rtol=1e-9, atol=1e-12)
        got_raw = dispatch.reduce_raw(uv, xv, 3, weight=w)
        want_raw = moments.reduce_raw_comoments(uv, xv, 3, weight=w)
        for g, e in zip(got_raw, want_raw):
            np.testing.assert_allclose(g, np.asarray(e), rtol=1e-11)
    finally:
        dispatch.set_impl(None)


def test_native_data_layer_end_to_end(flat_samples):
    # DataCentralMoments built while the native backend is forced must give
    # the same derivatives as the XLA path
    from thermoextrap_tpu import factory_data_values
    from thermoextrap_tpu.beta import factory_extrapmodel

    uv, xv, w = flat_samples

    def build():
        data = factory_data_values(uv=uv, xv=xv[:, 0], order=3, central=True)
        return np.asarray(factory_extrapmodel(1.0, data).derivs())

    dispatch.set_impl("native")
    try:
        d_native = build()
    finally:
        dispatch.set_impl(None)
    np.testing.assert_allclose(d_native, build(), rtol=1e-10)
