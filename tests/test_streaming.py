"""Streaming/online moment accumulation: ``DataCentralMoments.zeros`` +
``push_vals`` / ``merge`` must be EXACTLY equivalent to a one-shot reduce
over the concatenated samples (same shifted-moment pooling rule as
``reduce`` and the sharded reduction).

The reference has no streaming path (cmomy reduces complete timeseries,
reference data.py:485-534); this is a production-serving extension, so the
gate is exactness against the one-shot constructors the reference parity
tests already cover.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thermoextrap_tpu import beta as beta_xpan
from thermoextrap_tpu.data import DataCentralMoments
from thermoextrap_tpu.ops.resample import poisson1_freq

ORDER = 6
R = 3000


@pytest.fixture(scope="module")
def vals():
    rng = np.random.default_rng(7)
    uv = jnp.asarray(rng.normal(10.0, 1.0, R))
    xv = jnp.asarray(rng.normal(2.0, 0.5, (R, 3)))
    return uv, xv


def assert_args_equal(a, b):
    assert len(a) == len(b)
    for p, q in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(q), rtol=1e-12, atol=1e-13
        )


def test_push_vals_matches_one_shot(vals):
    uv, xv = vals
    one = DataCentralMoments.from_vals(xv, uv, ORDER)
    acc = DataCentralMoments.zeros(ORDER, val_shape=(3,), dtype=jnp.float64)
    for lo, hi in [(0, 700), (700, 1800), (1800, R)]:  # uneven chunks
        acc = acc.push_vals(xv[lo:hi], uv[lo:hi])
    assert_args_equal(one.derivs_args, acc.derivs_args)
    assert float(acc.wsum) == R


def test_merge_matches_one_shot(vals):
    uv, xv = vals
    one = DataCentralMoments.from_vals(xv, uv, ORDER)
    a = DataCentralMoments.from_vals(xv[:1200], uv[:1200], ORDER)
    b = DataCentralMoments.from_vals(xv[1200:], uv[1200:], ORDER)
    assert_args_equal(one.derivs_args, a.merge(b).derivs_args)
    # n-ary merge in one call
    c3 = [
        DataCentralMoments.from_vals(xv[lo:hi], uv[lo:hi], ORDER)
        for lo, hi in [(0, 500), (500, 2222), (2222, R)]
    ]
    assert_args_equal(one.derivs_args, c3[0].merge(*c3[1:]).derivs_args)


def test_merge_weighted(vals):
    uv, xv = vals
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.uniform(0.5, 2.0, R))
    one = DataCentralMoments.from_vals(xv, uv, ORDER, weight=w)
    m = DataCentralMoments.from_vals(
        xv[:500], uv[:500], ORDER, weight=w[:500]
    ).merge(
        DataCentralMoments.from_vals(xv[500:], uv[500:], ORDER, weight=w[500:])
    )
    assert_args_equal(one.derivs_args, m.derivs_args)


def test_merge_xalpha(vals):
    uv, _ = vals
    rng = np.random.default_rng(5)
    xva = jnp.asarray(rng.normal(1.0, 0.3, (R, ORDER + 1, 2)))
    one = DataCentralMoments.from_vals(xva, uv, ORDER, xalpha=True)
    a = DataCentralMoments.from_vals(xva[:1000], uv[:1000], ORDER, xalpha=True)
    b = DataCentralMoments.from_vals(xva[1000:], uv[1000:], ORDER, xalpha=True)
    assert_args_equal(one.derivs_args, a.merge(b).derivs_args)


def test_streaming_x_is_u(vals):
    uv, _ = vals
    one = DataCentralMoments.from_vals(None, uv, ORDER)
    assert one.x_is_u  # xv=None must imply x_is_u (reference data.py:376)
    acc = DataCentralMoments.zeros(ORDER, dtype=jnp.float64, x_is_u=True)
    acc = acc.push_vals(None, uv[:1111]).push_vals(None, uv[1111:])
    assert_args_equal(one.derivs_args, acc.derivs_args)


def test_scan_streaming_under_jit(vals):
    """The accumulator is a pytree with a static default callback, so
    ``push_vals`` works as a jitted ``lax.scan`` body over chunked arrays."""
    uv, xv = vals
    one = DataCentralMoments.from_vals(xv, uv, ORDER)
    cx = xv.reshape(5, R // 5, 3)
    cu = uv.reshape(5, R // 5)

    @jax.jit
    def stream(cx, cu):
        init = DataCentralMoments.zeros(
            ORDER, val_shape=(3,), dtype=jnp.float64
        )
        def body(carry, chunk):
            return carry.push_vals(chunk[0], chunk[1]), None
        out, _ = jax.lax.scan(body, init, (cx, cu))
        return out

    assert_args_equal(one.derivs_args, stream(cx, cu).derivs_args)


def test_cross_constructor_merge(vals):
    """States built by from_ave_central (full-rank du pads) merge exactly
    with states built by from_vals (val-rank du pads)."""
    uv, xv = vals
    fa = DataCentralMoments.from_vals(xv[:500], uv[:500], ORDER)
    fb = DataCentralMoments.from_ave_central(
        fa.xave, fa.uave, fa.du, fa.dxdu, wsum=fa.wsum
    )
    m = fb.merge(DataCentralMoments.from_vals(xv[500:], uv[500:], ORDER))
    one = DataCentralMoments.from_vals(xv, uv, ORDER)
    assert_args_equal(one.derivs_args, m.derivs_args)


def test_streamed_state_feeds_extrap_model(vals):
    """End-to-end: a streamed state drives factory_extrapmodel identically
    to the one-shot state."""
    uv, xv = vals
    one = DataCentralMoments.from_vals(xv, uv, ORDER)
    acc = DataCentralMoments.zeros(ORDER, val_shape=(3,), dtype=jnp.float64)
    for lo, hi in [(0, 1500), (1500, R)]:
        acc = acc.push_vals(xv[lo:hi], uv[lo:hi])
    m_one = beta_xpan.factory_extrapmodel(1.0, one)
    m_acc = beta_xpan.factory_extrapmodel(1.0, acc)
    betas = jnp.asarray([0.8, 1.0, 1.3])
    np.testing.assert_allclose(
        np.asarray(m_one.predict(betas)),
        np.asarray(m_acc.predict(betas)),
        rtol=1e-12,
    )


def test_streaming_pipeline_matches_one_shot(vals):
    """make_streaming_extrap_pipeline == make_extrap_pipeline on the same
    samples, fed in chunks."""
    from thermoextrap_tpu.pipeline import (
        make_extrap_pipeline,
        make_streaming_extrap_pipeline,
    )

    uv, xv = vals
    betas = jnp.asarray([0.8, 1.0, 1.2])
    run = make_extrap_pipeline(order=4, beta0=1.0)
    want = np.asarray(run(uv, xv, betas))

    state, update, predict = make_streaming_extrap_pipeline(
        4, 1.0, val_shape=(3,), dtype=jnp.float64
    )
    for lo, hi in [(0, 1000), (1000, 1800), (1800, R)]:
        state = update(state, uv[lo:hi], xv[lo:hi])
    got = np.asarray(predict(state, betas))
    np.testing.assert_allclose(want, got, rtol=1e-12)

    # minus_log path
    xpos = jnp.abs(xv) + 1.0
    run_ml = make_extrap_pipeline(order=4, beta0=1.0, minus_log=True)
    want_ml = np.asarray(run_ml(uv, xpos, betas))
    state, update, predict = make_streaming_extrap_pipeline(
        4, 1.0, minus_log=True, val_shape=(3,), dtype=jnp.float64
    )
    state = update(state, uv, xpos)
    np.testing.assert_allclose(
        want_ml, np.asarray(predict(state, betas)), rtol=1e-12
    )


def test_streaming_pipeline_weighted(vals):
    """Weighted chunks through update == weighted one-shot pipeline."""
    from thermoextrap_tpu.pipeline import (
        make_extrap_pipeline,
        make_streaming_extrap_pipeline,
    )

    uv, xv = vals
    rng = np.random.default_rng(29)
    w = jnp.asarray(rng.uniform(0.5, 2.0, R))
    betas = jnp.asarray([0.9, 1.0, 1.1])
    run = make_extrap_pipeline(order=4, beta0=1.0, weighted=True)
    want = np.asarray(run(uv, xv, betas, w))

    state, update, predict = make_streaming_extrap_pipeline(
        4, 1.0, val_shape=(3,), dtype=jnp.float64
    )
    for lo, hi in [(0, 1000), (1000, R)]:
        state = update(state, uv[lo:hi], xv[lo:hi], weight=w[lo:hi])
    np.testing.assert_allclose(
        want, np.asarray(predict(state, betas)), rtol=1e-12
    )
    assert float(state.wsum) == pytest.approx(float(w.sum()), rel=1e-12)


def test_streaming_pipeline_mesh_matches_single_device(vals):
    """mesh= streaming: sharded chunk reduce + exact merge equals the
    single-device streamed state and the one-shot pipeline."""
    from thermoextrap_tpu.parallel import make_mesh, shard_rec
    from thermoextrap_tpu.pipeline import (
        make_extrap_pipeline,
        make_streaming_extrap_pipeline,
    )

    uv, xv = vals
    betas = jnp.asarray([0.8, 1.0, 1.2])
    mesh = make_mesh(8, axis_names=("rec",))
    want = np.asarray(make_extrap_pipeline(order=4, beta0=1.0)(uv, xv, betas))

    state, update, predict = make_streaming_extrap_pipeline(
        4, 1.0, val_shape=(3,), dtype=jnp.float64, mesh=mesh
    )
    for lo, hi in [(0, 1400), (1400, 2200), (2200, R)]:  # each %8 == 0
        state = update(
            state, shard_rec(uv[lo:hi], mesh), shard_rec(xv[lo:hi], mesh)
        )
    got = np.asarray(predict(state, betas))
    np.testing.assert_allclose(want, got, rtol=1e-12)


def test_merge_batched_grid_states(vals):
    """Batched (macrostate-grid) states pool elementwise over the grid —
    the lnPi streaming path: grid chunks merge exactly."""
    _, _ = vals
    rng = np.random.default_rng(11)
    g, r = 5, 1200
    uv = jnp.asarray(rng.normal(-8.0, 1.5, (g, r)) + np.arange(g)[:, None])
    one = DataCentralMoments.from_vals(None, uv, ORDER)  # batched x_is_u
    a = DataCentralMoments.from_vals(None, uv[:, :500], ORDER)
    b = DataCentralMoments.from_vals(None, uv[:, 500:], ORDER)
    m = a.merge(b)
    assert m.wsum.shape == (g,)
    assert_args_equal(one.derivs_args, m.derivs_args)

    # batched x != u with a value axis
    xv = jnp.asarray(rng.normal(1.0, 0.4, (g, r, 2)))
    one2 = DataCentralMoments.from_vals(xv, uv, ORDER)
    m2 = DataCentralMoments.from_vals(xv[:, :700], uv[:, :700], ORDER).merge(
        DataCentralMoments.from_vals(xv[:, 700:], uv[:, 700:], ORDER)
    )
    assert_args_equal(one2.derivs_args, m2.derivs_args)


def test_reduce_keeps_remaining_batch_axes(vals):
    """reduce(axis) pools ONE axis and keeps the rest (previously the merge
    pooled every axis at once — a grid state would silently collapse)."""
    _, _ = vals
    rng = np.random.default_rng(13)
    nblock, g, blk = 3, 4, 400
    uv = jnp.asarray(rng.normal(2.0, 1.0, (nblock, g, blk)))
    xv = jnp.asarray(rng.normal(1.0, 0.5, (nblock, g, blk, 2)))
    blocks = DataCentralMoments.from_vals(xv, uv, ORDER)
    pooled = blocks.reduce(axis=0)
    assert pooled.wsum.shape == (g,)
    # per-grid-point pooling over blocks == one-shot over concatenated recs
    uv_cat = jnp.moveaxis(uv, 0, 1).reshape(g, nblock * blk)
    xv_cat = jnp.moveaxis(xv, 0, 1).reshape(g, nblock * blk, 2)
    one = DataCentralMoments.from_vals(xv_cat, uv_cat, ORDER)
    assert_args_equal(one.derivs_args, pooled.derivs_args)


def test_streaming_lnpi_pipeline_matches_one_shot():
    """Streamed lnPi grid state == one-shot make_lnpi_pipeline, single
    device and mesh-sharded."""
    from thermoextrap_tpu.parallel import make_mesh
    from thermoextrap_tpu.pipeline import (
        make_lnpi_pipeline,
        make_streaming_lnpi_pipeline,
    )

    rng = np.random.default_rng(17)
    g, r, order = 6, 1600, 3
    uv = jnp.asarray(rng.normal(-9.0, 1.2, (g, r)) + np.arange(g)[:, None])
    lnpi0 = jnp.linspace(0.0, -4.0, g)
    mudotn = 0.6 * jnp.arange(g, dtype=jnp.float64)
    betas = jnp.asarray([1.2, 1.4, 1.7])

    want = np.asarray(make_lnpi_pipeline(order, 1.4)(uv, lnpi0, mudotn, betas))

    state, update, predict = make_streaming_lnpi_pipeline(
        order, 1.4, grid_shape=(g,), dtype=jnp.float64
    )
    for lo, hi in [(0, 600), (600, r)]:
        state = update(state, uv[:, lo:hi])
    got = np.asarray(predict(state, lnpi0, mudotn, betas))
    np.testing.assert_allclose(want, got, rtol=1e-12)

    mesh = make_mesh(8, axis_names=("rec",))
    state_m, update_m, predict_m = make_streaming_lnpi_pipeline(
        order, 1.4, grid_shape=(g,), dtype=jnp.float64, mesh=mesh
    )
    for lo, hi in [(0, 800), (800, r)]:  # chunk lengths % 8 == 0
        state_m = update_m(state_m, uv[:, lo:hi])
    got_m = np.asarray(predict_m(state_m, lnpi0, mudotn, betas))
    np.testing.assert_allclose(want, got_m, rtol=1e-12)


def test_streaming_jackknife(vals):
    """Leave-one-chunk-out states are exact (== one-shot over the kept
    chunks) and the jackknife std err tracks the bootstrap std."""
    from thermoextrap_tpu.pipeline import (
        make_extrap_pipeline,
        make_streaming_extrap_pipeline,
        streaming_jackknife,
    )

    uv, xv = vals
    betas = jnp.asarray([0.8, 1.0, 1.2])
    nchunk = 6
    cu = uv.reshape(nchunk, R // nchunk)
    cx = xv.reshape(nchunk, R // nchunk, 3)
    states = [
        DataCentralMoments.from_vals(cx[i], cu[i], 4) for i in range(nchunk)
    ]

    _, _, predict = make_streaming_extrap_pipeline(
        4, 1.0, val_shape=(3,), dtype=jnp.float64
    )
    pred, se = streaming_jackknife(states, predict, betas)

    # full prediction == one-shot pipeline
    want = np.asarray(make_extrap_pipeline(order=4, beta0=1.0)(uv, xv, betas))
    np.testing.assert_allclose(want, np.asarray(pred), rtol=1e-12)

    # exactness of one LOO state: merge of chunks != 2 equals one-shot
    keep = [i for i in range(nchunk) if i != 2]
    loo = states[keep[0]].merge(*[states[i] for i in keep[1:]])
    mask = np.ones(R, bool)
    mask[2 * (R // nchunk) : 3 * (R // nchunk)] = False
    one = DataCentralMoments.from_vals(xv[mask], uv[mask], 4)
    assert_args_equal(one.derivs_args, loo.derivs_args)

    # std err is positive and within a small factor of the iid bootstrap
    run_b = make_extrap_pipeline(order=4, beta0=1.0, nrep=512)
    _, bstd = run_b(uv, xv, betas, seed=0)
    ratio = np.asarray(se) / np.asarray(bstd)
    assert np.all(np.asarray(se) > 0)
    assert np.all((ratio > 0.3) & (ratio < 3.0)), ratio

    with pytest.raises(ValueError, match=">= 2"):
        streaming_jackknife(states[:1], predict, betas)


def test_reduce_negative_axis(vals):
    """reduce(axis=-1) must pool the LAST batch axis (negative axes used
    to shift onto the moment axis via the +1 offset)."""
    _, _ = vals
    rng = np.random.default_rng(19)
    g, nblock, blk = 3, 4, 300
    uv = jnp.asarray(rng.normal(2.0, 1.0, (g, nblock, blk)))
    xv = jnp.asarray(rng.normal(1.0, 0.5, (g, nblock, blk, 2)))
    blocks = DataCentralMoments.from_vals(xv, uv, ORDER)
    a = blocks.reduce(axis=1)
    b = blocks.reduce(axis=-1)
    assert b.wsum.shape == (g,)
    assert_args_equal(a.derivs_args, b.derivs_args)


def test_bf16_weight_does_not_quantize_wsum(vals):
    """Explicit bf16 weights must sum in >= f32 (8-bit-mantissa sums round
    above 256 — the count would bias every weighted merge)."""
    uv, xv = vals
    w = jnp.ones(R, jnp.bfloat16)
    d = DataCentralMoments.from_vals(
        xv.astype(jnp.bfloat16), uv.astype(jnp.bfloat16), ORDER, weight=w
    )
    assert float(d.wsum) == R
    assert d.wsum.dtype in (jnp.float32, jnp.float64)


def test_stateless_callback_subclass_equality():
    """Type-based callback equality must stay reflexive under subclassing
    (subclass instances equal their own kind, not DataCallback)."""
    from thermoextrap_tpu.data import DataCallback

    class MyCB(DataCallback):
        pass

    assert MyCB() == MyCB()
    assert DataCallback() == DataCallback()
    assert MyCB() != DataCallback()
    assert DataCallback() != MyCB()


def test_merge_masks_zero_weight_members(vals):
    """Zero-weight members must contribute NOTHING — not NaN: the empty
    accumulator (uave=0) makes delta**order overflow f32 for large-mean
    streams, and an all-zero-weight chunk carries 0/0 stats; both are
    masked on w > 0 in the merge."""
    from thermoextrap_tpu.pipeline import make_streaming_extrap_pipeline

    uv, xv = vals
    # (a) default-f32 pipeline, large-mean energies, FIRST update
    rng = np.random.default_rng(31)
    u_big = (1e7 + rng.normal(0, 1e3, 4000)).astype(np.float32)
    x_big = rng.normal(2.0, 0.5, 4000).astype(np.float32)
    state, update, predict = make_streaming_extrap_pipeline(6, 1.0)
    s1 = update(state, u_big, x_big)
    assert np.all(np.isfinite(np.asarray(s1.du)))
    assert np.all(
        np.isfinite(np.asarray(predict(s1, jnp.asarray([1.0], jnp.float32))))
    )

    # (b) an all-zero-weight (burn-in-masked) chunk merges as a no-op
    good = DataCentralMoments.from_vals(xv, uv, ORDER)
    burn = DataCentralMoments.from_vals(
        xv, uv, ORDER, weight=jnp.zeros(R)
    )
    m = good.merge(burn)
    assert_args_equal(good.derivs_args, m.derivs_args)

    # (c) merging two empty states stays finite (still zero weight)
    z = DataCentralMoments.zeros(ORDER, val_shape=(3,), dtype=jnp.float64)
    zz = z.merge(z)
    assert float(zz.wsum) == 0.0
    assert np.all(np.isfinite(np.asarray(zz.du)))


def test_merge_validation(vals):
    uv, xv = vals
    a = DataCentralMoments.from_vals(xv, uv, ORDER)
    with pytest.raises(ValueError, match="identical"):
        a.merge(DataCentralMoments.from_vals(xv, uv, ORDER - 1))
    batched = DataCentralMoments.from_vals(
        xv.reshape(2, R // 2, 3), uv.reshape(2, R // 2), ORDER
    )
    # batch shapes must agree (flat vs batched cannot pool)
    with pytest.raises(ValueError, match="batch shape"):
        a.merge(batched)


def test_save_load_checkpoint_roundtrip(vals, tmp_path):
    """Mid-stream checkpoint/restore == uninterrupted stream, exactly."""
    uv, xv = vals
    path = tmp_path / "stream_state.npz"

    acc = DataCentralMoments.zeros(ORDER, val_shape=(3,), dtype=jnp.float64)
    acc = acc.push_vals(xv[:1100], uv[:1100])
    acc.save(path)

    resumed = DataCentralMoments.load(path)
    assert resumed.order == ORDER
    assert resumed.val_ndim == 1
    assert resumed.du.dtype == acc.du.dtype
    resumed = resumed.push_vals(xv[1100:], uv[1100:])

    unbroken = DataCentralMoments.zeros(
        ORDER, val_shape=(3,), dtype=jnp.float64
    ).push_vals(xv[:1100], uv[:1100]).push_vals(xv[1100:], uv[1100:])
    assert_args_equal(unbroken.derivs_args, resumed.derivs_args)
    # the restored state is a live pytree: jitted update still works
    jitted = jax.jit(lambda s, x, u: s.push_vals(x, u))
    again = jitted(DataCentralMoments.load(path), xv[1100:], uv[1100:])
    assert_args_equal(unbroken.derivs_args, again.derivs_args)


def test_save_load_bf16_and_batched(vals, tmp_path):
    uv, xv = vals
    # bf16 accumulator stored as f32 (exact superset), restored to bf16
    # (note: bare push_vals promotes with the chunk dtype — the bf16-held
    # state arises via the pipeline update, which casts back; emulate it)
    b = DataCentralMoments.from_vals(xv[:, 0], uv, ORDER)
    b = jax.tree.map(lambda a: a.astype(jnp.bfloat16), b)
    p = tmp_path / "bf16.npz"
    b.save(p)
    rb = DataCentralMoments.load(p)
    assert rb.dxdu.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(rb.dxdu, np.float32), np.asarray(b.dxdu, np.float32)
    )
    # batched (grid) states checkpoint too, x_is_u preserved
    g = DataCentralMoments.from_vals(
        None, uv.reshape(4, -1), ORDER
    )
    p2 = tmp_path / "grid.npz"
    g.save(p2)
    rg = DataCentralMoments.load(p2)
    assert rg.x_is_u and rg.wsum.shape == (4,)
    assert_args_equal(g.derivs_args, rg.derivs_args)


def test_save_load_suffixless_path(vals, tmp_path):
    """np.savez appends '.npz' to suffixless paths; save()/load() must
    round-trip for a bare path anyway (the restart seam otherwise fails
    exactly at restart time)."""
    uv, xv = vals
    s = DataCentralMoments.from_vals(xv[:, 0], uv, ORDER)
    bare = tmp_path / "ckpt"  # no suffix
    s.save(bare)
    assert (tmp_path / "ckpt.npz").exists()
    r = DataCentralMoments.load(bare)
    assert_args_equal(s.derivs_args, r.derivs_args)


def test_streaming_interp_pipeline_matches_one_shot(vals):
    """Multi-state streaming interpolation == InterpModel over one-shot
    reduced data at every reference state."""
    from thermoextrap_tpu.models.extrap import InterpModel
    from thermoextrap_tpu.pipeline import make_streaming_interp_pipeline

    uv, xv = vals
    beta0s = [0.8, 1.3]
    # two "simulations": disjoint halves of the fixture at different betas
    ua, xa = uv[: R // 2], xv[: R // 2, 0]
    ub, xb = uv[R // 2 :] * 1.1, xv[R // 2 :, 0] + 0.2

    states, update, predict = make_streaming_interp_pipeline(
        4, beta0s, dtype=jnp.float64
    )
    # interleaved chunk arrival across the two states
    states = update(states, 0, ua[:700], xa[:700])
    states = update(states, 1, ub[:400], xb[:400])
    states = update(states, 0, ua[700:], xa[700:])
    states = update(states, 1, ub[400:], xb[400:])
    betas = jnp.asarray([0.8, 1.0, 1.25])
    got = np.asarray(predict(states, betas))

    one = InterpModel(
        [
            beta_xpan.factory_extrapmodel(
                b, DataCentralMoments.from_vals(x, u, 4)
            )
            for b, (u, x) in zip(beta0s, [(ua, xa), (ub, xb)])
        ]
    )
    want = np.asarray(one.predict(betas))
    # chunked merge vs one-shot reduce differ by f64 summation order only
    np.testing.assert_allclose(got, want, rtol=1e-8)

    # jackknife composes with the interp predict: retain per-chunk states
    # for state 0 (state 1 stays pooled), close over the pooled partner,
    # and the pooled-state prediction must equal the joint result above
    from thermoextrap_tpu.pipeline import streaming_jackknife

    zero = DataCentralMoments.zeros(4, dtype=jnp.float64)
    chunks0 = [
        zero.push_vals(xa[:700], ua[:700]),
        zero.push_vals(xa[700:], ua[700:]),
    ]
    s1_pooled = states[1]
    jk_pred, jk_se = streaming_jackknife(
        chunks0, lambda s0, b: predict((s0, s1_pooled), b), betas
    )
    np.testing.assert_allclose(np.asarray(jk_pred), got, rtol=1e-12)
    assert jk_se.shape == jk_pred.shape
    assert np.all(np.asarray(jk_se) >= 0) and np.all(np.isfinite(jk_se))

    with pytest.raises(ValueError, match=">= 2 reference states"):
        make_streaming_interp_pipeline(4, [1.0])


class TestStreamingBootstrap:
    """make_streaming_extrap_pipeline(nrep=): per-chunk Poisson replicate
    folding must equal the one-shot bootstrap over the SAME frequency
    table (the per-chunk draws concatenated)."""

    def _pipeline(self, **kws):
        from thermoextrap_tpu.pipeline import make_streaming_extrap_pipeline

        return make_streaming_extrap_pipeline(
            3, 1.0, val_shape=(2,), dtype=jnp.float64, nrep=16, seed=11, **kws
        )

    def _chunks(self, rng, n=4, c=250):
        uv = rng.normal(5.0, 1.0, n * c)
        xv = rng.normal(2.0, 0.5, (n * c, 2))
        return uv, xv, [
            (uv[i * c : (i + 1) * c], xv[i * c : (i + 1) * c]) for i in range(n)
        ]

    def test_streamed_ci_equals_oneshot_same_freq(self, rng_np):
        from thermoextrap_tpu.models.derivatives import central_x_ave_coefs
        from thermoextrap_tpu.models.extrap import _poly_eval
        from thermoextrap_tpu.ops.resample import resample_central_comoments

        uv, xv, chunks = self._chunks(rng_np)
        state, update, predict = self._pipeline()
        for c in chunks:
            state = update(state, *c)
        betas = np.array([0.8, 1.0, 1.2])
        pred, std = predict(state, betas)

        # reconstruct the per-chunk Poisson tables the CPU path drew
        freqs = [
            poisson1_freq(
                jax.random.fold_in(jax.random.key(11), step),
                (16, len(ch[0])),
                dtype=jnp.int32,
            )
            for step, ch in enumerate(chunks)
        ]
        freq_full = jnp.concatenate(freqs, axis=1)
        bx, _bu, bdu, bdxdu = resample_central_comoments(
            uv, xv, freq_full, 3
        )
        bpred = _poly_eval(
            central_x_ave_coefs(bx, bdu[:, :, None], bdxdu, 3),
            betas - 1.0,
        )
        np.testing.assert_allclose(
            np.asarray(std), np.asarray(bpred.std(axis=1)), rtol=1e-9
        )
        # the mean leg is untouched by the replicate machinery
        from thermoextrap_tpu.pipeline import make_streaming_extrap_pipeline

        st_m, up_m, pr_m = make_streaming_extrap_pipeline(
            3, 1.0, val_shape=(2,), dtype=jnp.float64
        )
        for c in chunks:
            st_m = up_m(st_m, *c)
        np.testing.assert_allclose(
            np.asarray(pred), np.asarray(pr_m(st_m, betas)), rtol=1e-13
        )

    def test_zero_weight_chunk_is_noop(self, rng_np):
        uv, xv, chunks = self._chunks(rng_np, n=2)
        state, update, predict = self._pipeline()
        state = update(state, *chunks[0])
        betas = np.array([0.9, 1.1])
        before = [np.asarray(a) for a in predict(state, betas)]
        state2 = update(state, *chunks[1], weight=np.zeros(len(chunks[1][0])))
        after = [np.asarray(a) for a in predict(state2, betas)]
        for b, a in zip(before, after):
            np.testing.assert_allclose(a, b, rtol=1e-12)

    def test_mesh_matches_unmeshed(self, rng_np):
        from thermoextrap_tpu.parallel import make_mesh, shard_rec

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh8 = make_mesh(8, axis_names=("rep", "rec"))
        uv, xv, chunks = self._chunks(rng_np, n=2, c=256)
        s_cpu, up_cpu, pr_cpu = self._pipeline()
        s_m, up_m, pr_m = self._pipeline(mesh=mesh8)
        for c in chunks:
            s_cpu = up_cpu(s_cpu, *c)
            s_m = up_m(s_m, shard_rec(c[0], mesh8), shard_rec(c[1], mesh8))
        betas = np.array([0.85, 1.15])
        for a, b in zip(pr_cpu(s_cpu, betas), pr_m(s_m, betas)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-9, atol=1e-12
            )

    def test_ci_tracks_oneshot_pipeline_ci(self, rng_np):
        # statistical sanity: the streamed Poisson CI lands within a loose
        # factor of the one-shot pipeline's bootstrap CI (different draws)
        from thermoextrap_tpu.pipeline import make_extrap_pipeline

        rng = np.random.default_rng(23)
        uv = rng.normal(5.0, 1.0, 4000)
        xv = rng.normal(2.0, 0.5, (4000, 1))
        from thermoextrap_tpu.pipeline import make_streaming_extrap_pipeline

        state, update, predict = make_streaming_extrap_pipeline(
            2, 1.0, val_shape=(1,), dtype=jnp.float64, nrep=64, seed=3
        )
        for i in range(4):
            state = update(state, uv[i * 1000 : (i + 1) * 1000], xv[i * 1000 : (i + 1) * 1000])
        betas = np.array([0.9, 1.0, 1.1])
        _pred, std = predict(state, betas)
        run = make_extrap_pipeline(2, 1.0, nrep=64)
        _p1, std1 = run(uv, xv, betas, seed=5)
        ratio = np.asarray(std) / np.asarray(std1)
        assert np.all(ratio > 0.5) and np.all(ratio < 2.0), ratio

    def test_ingest_stream_fan_in_tuple_state(self, rng_np):
        from thermoextrap_tpu import io_stream

        uv, xv, chunks = self._chunks(rng_np)
        state0, update, predict = self._pipeline()
        direct = state0
        for c in chunks:
            direct = update(direct, *c)
        fanned = io_stream.ingest_stream(update, state0, iter(chunks), fan_in=2)
        betas = np.array([0.8, 1.2])
        for a, b in zip(predict(direct, betas), predict(fanned, betas)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-12)


class TestStreamingInterpBootstrap:
    """make_streaming_interp_pipeline(nrep=): per-state replicate
    accumulators solved jointly; CI must equal an InterpModel built over
    replicate data assembled from the SAME per-state frequency tables."""

    ORDER, NREP, SEED = 2, 12, 5
    BETA0S = (0.7, 1.3)

    def test_streamed_ci_equals_oneshot_same_freq(self, rng_np):
        from thermoextrap_tpu.beta import factory_derivatives
        from thermoextrap_tpu.data import DataCentralMoments
        from thermoextrap_tpu.models.extrap import ExtrapModel, InterpModel
        from thermoextrap_tpu.ops.resample import resample_central_comoments
        from thermoextrap_tpu.pipeline import make_streaming_interp_pipeline

        n, c, v = 2, 300, 2
        data = []
        for b in self.BETA0S:
            uv = rng_np.normal(5.0 / b, 1.0, n * c)
            xv = rng_np.normal(b, 0.3, (n * c, v))
            data.append((uv, xv))

        states, update, predict = make_streaming_interp_pipeline(
            self.ORDER, self.BETA0S, val_shape=(v,), dtype=jnp.float64,
            nrep=self.NREP, seed=self.SEED,
        )
        for i, (uv, xv) in enumerate(data):
            for k in range(n):
                states = update(
                    states, i, uv[k * c : (k + 1) * c], xv[k * c : (k + 1) * c]
                )
        betas = np.array([0.8, 1.0, 1.2])
        pred, std = predict(states, betas)

        # oracle: reconstruct each state's per-chunk freq tables (seeds
        # derived exactly as the pipeline derives them), bootstrap the full
        # streams one-shot, and solve the joint system per replicate
        derivs = factory_derivatives("x_ave", central=True)
        rep_models, mean_models = [], []
        for i, (b, (uv, xv)) in enumerate(zip(self.BETA0S, data)):
            seed_i = int((self.SEED + 0x9E3779B9 * (i + 1)) & 0x7FFFFFFF)
            freq = jnp.concatenate(
                [
                    poisson1_freq(
                        jax.random.fold_in(jax.random.key(seed_i), s),
                        (self.NREP, c),
                        dtype=jnp.int32,
                    )
                    for s in range(n)
                ],
                axis=1,
            )
            bx, bu, bdu, bdxdu = resample_central_comoments(
                uv, xv, freq, self.ORDER
            )
            rep_data = DataCentralMoments.from_ave_central(
                bx, bu, bdu, bdxdu, wsum=freq.sum(axis=1).astype(jnp.float64)
            )
            rep_models.append(
                ExtrapModel(
                    alpha0=b, data=rep_data, derivatives=derivs,
                    order=self.ORDER, alpha_name="beta",
                )
            )
        want_std = np.asarray(
            InterpModel(rep_models).predict(betas).std(axis=1)
        )
        np.testing.assert_allclose(np.asarray(std), want_std, rtol=1e-9)

        # mean leg untouched by the replicate machinery
        s0, up0, pr0 = make_streaming_interp_pipeline(
            self.ORDER, self.BETA0S, val_shape=(v,), dtype=jnp.float64
        )
        for i, (uv, xv) in enumerate(data):
            for k in range(n):
                s0 = up0(s0, i, uv[k * c : (k + 1) * c], xv[k * c : (k + 1) * c])
        np.testing.assert_allclose(
            np.asarray(pred), np.asarray(pr0(s0, betas)), rtol=1e-12
        )
        assert np.all(np.asarray(std) > 0)

    def test_state_seeds_differ(self):
        # independent simulations must not share bootstrap frequencies:
        # with identical data in both states, replicate scatter must NOT
        # be identical across states (it would be with a shared seed)
        from thermoextrap_tpu.pipeline import make_streaming_interp_pipeline

        rng = np.random.default_rng(2)
        uv = rng.normal(5.0, 1.0, 400)
        xv = rng.normal(2.0, 0.5, (400, 1))
        states, update, predict = make_streaming_interp_pipeline(
            self.ORDER, self.BETA0S, val_shape=(1,), dtype=jnp.float64,
            nrep=self.NREP, seed=self.SEED,
        )
        states = update(states, 0, uv, xv)
        states = update(states, 1, uv, xv)
        rep0, rep1 = states[0][1], states[1][1]
        assert not np.allclose(np.asarray(rep0.xave), np.asarray(rep1.xave))


class TestStreamingLnpiBootstrap:
    """make_streaming_lnpi_pipeline(nrep=): per-chunk Poisson replicate
    folding over the macrostate grid must equal the one-shot batched
    bootstrap over the SAME frequency table (freqs shared across the grid:
    replicates resample whole configurations, reference lnpi.py:258-286)."""

    ORDER, G, NREP, SEED = 3, 5, 24, 13

    def _pipeline(self, **kws):
        from thermoextrap_tpu.pipeline import make_streaming_lnpi_pipeline

        return make_streaming_lnpi_pipeline(
            self.ORDER, 1.0, grid_shape=(self.G,), dtype=jnp.float64,
            nrep=self.NREP, seed=self.SEED, **kws
        )

    def _data(self, rng, n=3, c=400):
        uv = rng.normal(2.0, 0.4, (self.G, n * c)) + np.linspace(
            0.0, 1.0, self.G
        )[:, None]
        lnpi0 = rng.normal(0.0, 1.0, self.G)
        mudotn = np.linspace(0.0, 4.0, self.G)
        chunks = [uv[:, i * c : (i + 1) * c] for i in range(n)]
        return uv, lnpi0, mudotn, chunks

    def test_streamed_ci_equals_oneshot_same_freq(self, rng_np):
        from thermoextrap_tpu.models.derivatives import (
            central_u_ave_coefs,
            lnpi_coefs,
        )
        from thermoextrap_tpu.models.extrap import _poly_eval
        from thermoextrap_tpu.ops.resample import (
            resample_central_umoments_batched,
        )

        uv, lnpi0, mudotn, chunks = self._data(rng_np)
        state, update, predict = self._pipeline()
        for c in chunks:
            state = update(state, c)
        betas = np.array([0.9, 1.0, 1.15])
        pred, std = predict(state, lnpi0, mudotn, betas)

        # reconstruct the per-chunk Poisson tables the CPU path drew
        freq = jnp.concatenate(
            [
                poisson1_freq(
                    jax.random.fold_in(jax.random.key(self.SEED), s),
                    (self.NREP, c.shape[-1]),
                    dtype=jnp.int32,
                )
                for s, c in enumerate(chunks)
            ],
            axis=1,
        )
        bu, bdu = resample_central_umoments_batched(uv, freq, self.ORDER)
        c = lnpi_coefs(
            central_u_ave_coefs(bu, bdu, self.ORDER - 1),
            jnp.asarray(lnpi0)[None],
            jnp.asarray(mudotn)[None],
            self.ORDER,
        )
        bpred = _poly_eval(c, betas - 1.0)
        np.testing.assert_allclose(
            np.asarray(std), np.asarray(bpred.std(axis=1)), rtol=1e-9
        )

        # the mean leg is untouched by the replicate machinery
        from thermoextrap_tpu.pipeline import make_streaming_lnpi_pipeline

        s0, up0, pr0 = make_streaming_lnpi_pipeline(
            self.ORDER, 1.0, grid_shape=(self.G,), dtype=jnp.float64
        )
        for ch in chunks:
            s0 = up0(s0, ch)
        np.testing.assert_allclose(
            np.asarray(pred),
            np.asarray(pr0(s0, lnpi0, mudotn, betas)),
            rtol=1e-13,
        )

    def test_mesh_matches_unmeshed(self, rng_np):
        from thermoextrap_tpu.parallel import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh8 = make_mesh(8, axis_names=("rep", "rec"))
        uv, lnpi0, mudotn, chunks = self._data(rng_np, n=2, c=512)
        s_cpu, up_cpu, pr_cpu = self._pipeline()
        s_m, up_m, pr_m = self._pipeline(mesh=mesh8)
        for c in chunks:
            s_cpu = up_cpu(s_cpu, c)
            s_m = up_m(s_m, c)
        betas = np.array([0.85, 1.1])
        for a, b in zip(
            pr_cpu(s_cpu, lnpi0, mudotn, betas),
            pr_m(s_m, lnpi0, mudotn, betas),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-9, atol=1e-12
            )

    def test_ci_tracks_oneshot_pipeline_ci(self, rng_np):
        # statistical sanity vs the one-shot pipeline's CI (different draws)
        from thermoextrap_tpu.pipeline import make_lnpi_pipeline

        uv, lnpi0, mudotn, chunks = self._data(rng_np, n=4, c=500)
        state, update, predict = self._pipeline()
        for c in chunks:
            state = update(state, c)
        betas = np.array([0.9, 1.1])
        _pred, std = predict(state, lnpi0, mudotn, betas)
        run = make_lnpi_pipeline(self.ORDER, 1.0, nrep=64)
        _p1, std1 = run(uv, lnpi0, mudotn, betas, seed=5)
        ratio = np.asarray(std) / np.asarray(std1)
        assert np.all(ratio > 0.4) and np.all(ratio < 2.5), ratio


class TestStreamingXalpha:
    """β-dependent observables through the streaming pipeline: the deriv
    columns ride as a leading value axis of the accumulator; predict-time
    assembly uses central_x_ave_coefs_xalpha."""

    @staticmethod
    def _xalpha_vals(order=4):
        rng = np.random.default_rng(11)
        uv = jnp.asarray(1.0 + 0.3 * rng.normal(size=R))
        base = 2.0 + 0.2 * rng.normal(size=R)
        xv = np.zeros((R, order + 1, 1))
        xv[:, 0, 0] = 2.0 * base
        xv[:, 1, 0] = base
        return uv, jnp.asarray(xv)

    def test_matches_one_shot(self):
        from thermoextrap_tpu.pipeline import (
            make_extrap_pipeline,
            make_streaming_extrap_pipeline,
        )

        uv, xv = self._xalpha_vals()
        betas = jnp.asarray([0.8, 1.0, 1.2])
        want = np.asarray(
            make_extrap_pipeline(4, 1.0, xalpha=True)(uv, xv, betas)
        )
        state, update, predict = make_streaming_extrap_pipeline(
            4, 1.0, xalpha=True, val_shape=(1,), dtype=jnp.float64
        )
        for lo, hi in [(0, 1000), (1000, 1800), (1800, R)]:
            state = update(state, uv[lo:hi], xv[lo:hi])
        got = np.asarray(predict(state, betas))
        np.testing.assert_allclose(want, got, rtol=1e-12)

    def test_minus_log_matches_one_shot(self):
        from thermoextrap_tpu.pipeline import (
            make_extrap_pipeline,
            make_streaming_extrap_pipeline,
        )

        uv, xv = self._xalpha_vals()
        betas = jnp.asarray([0.9, 1.1])
        want = np.asarray(
            make_extrap_pipeline(4, 1.0, xalpha=True, minus_log=True)(
                uv, xv, betas
            )
        )
        state, update, predict = make_streaming_extrap_pipeline(
            4, 1.0, xalpha=True, minus_log=True, val_shape=(1,),
            dtype=jnp.float64,
        )
        state = update(state, uv, xv)
        np.testing.assert_allclose(
            want, np.asarray(predict(state, betas)), rtol=1e-12
        )

    def test_bootstrap_ci(self):
        from thermoextrap_tpu.pipeline import make_streaming_extrap_pipeline

        uv, xv = self._xalpha_vals()
        betas = jnp.asarray([0.9, 1.1])
        state, update, predict = make_streaming_extrap_pipeline(
            4, 1.0, xalpha=True, val_shape=(1,), dtype=jnp.float64, nrep=64
        )
        for lo, hi in [(0, 1500), (1500, R)]:
            state = update(state, uv[lo:hi], xv[lo:hi])
        pred, std = (np.asarray(a) for a in predict(state, betas))
        assert np.all(np.isfinite(pred))
        assert np.all(std > 0)
        # mean path unaffected by replicate accumulators
        state1, update1, predict1 = make_streaming_extrap_pipeline(
            4, 1.0, xalpha=True, val_shape=(1,), dtype=jnp.float64
        )
        for lo, hi in [(0, 1500), (1500, R)]:
            state1 = update1(state1, uv[lo:hi], xv[lo:hi])
        np.testing.assert_allclose(
            pred, np.asarray(predict1(state1, betas)), rtol=1e-12
        )


class TestStreamingXisU:
    """<u>(β) streaming accumulation (x_is_u): u-moment-only state, update
    takes no xv; replicate folds ride the batched u-moment bootstrap."""

    @staticmethod
    def _uvals():
        rng = np.random.default_rng(13)
        return jnp.asarray(3.0 + 0.7 * rng.normal(size=R))

    def test_matches_one_shot(self):
        from thermoextrap_tpu.pipeline import (
            make_extrap_pipeline,
            make_streaming_extrap_pipeline,
        )

        uv = self._uvals()
        betas = jnp.asarray([0.8, 1.0, 1.2])
        want = np.asarray(
            make_extrap_pipeline(4, 1.0, x_is_u=True)(uv, betas)
        )
        state, update, predict = make_streaming_extrap_pipeline(
            4, 1.0, x_is_u=True, dtype=jnp.float64
        )
        for lo, hi in [(0, 1000), (1000, 1800), (1800, R)]:
            state = update(state, uv[lo:hi])
        np.testing.assert_allclose(
            want, np.asarray(predict(state, betas)), rtol=1e-12
        )

    def test_bootstrap_ci_and_weighted(self):
        from thermoextrap_tpu.pipeline import (
            make_extrap_pipeline,
            make_streaming_extrap_pipeline,
        )

        rng = np.random.default_rng(5)
        uv = self._uvals()
        w = jnp.asarray(rng.uniform(0.5, 1.5, R))
        betas = jnp.asarray([0.9, 1.1])
        state, update, predict = make_streaming_extrap_pipeline(
            4, 1.0, x_is_u=True, dtype=jnp.float64, nrep=64
        )
        for lo, hi in [(0, 1500), (1500, R)]:
            state = update(state, uv[lo:hi], weight=w[lo:hi])
        pred, std = (np.asarray(a) for a in predict(state, betas))
        assert np.all(np.isfinite(pred)) and np.all(std > 0)
        run_w = make_extrap_pipeline(4, 1.0, x_is_u=True, weighted=True)
        np.testing.assert_allclose(
            pred, np.asarray(run_w(uv, betas, w)), rtol=1e-12
        )

    def test_val_shape_rejected(self):
        import pytest

        from thermoextrap_tpu.pipeline import make_streaming_extrap_pipeline

        with pytest.raises(ValueError, match="val_shape"):
            make_streaming_extrap_pipeline(3, 1.0, x_is_u=True, val_shape=(2,))


class TestStreamingVolume:
    """make_streaming_volume_pipeline: exact chunked pooling of the
    volume-ensemble serving path."""

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

    def test_streamed_equals_one_shot(self, rng_np):
        from thermoextrap_tpu.pipeline import (
            make_streaming_volume_pipeline,
            make_volume_pipeline,
        )

        wv, xv, dxdqv = self._data(rng_np)
        vols = np.array([1.8, 2.0, 2.3])
        st, upd, prd = make_streaming_volume_pipeline(
            2.0, ndim=3, dtype=np.float64
        )
        for lo, hi in ((0, 1000), (1000, 2500), (2500, 4000)):
            st = upd(st, wv[lo:hi], xv[lo:hi], dxdqv[lo:hi])
        got = np.asarray(prd(st, vols))
        ref = np.asarray(
            make_volume_pipeline(2.0, ndim=3)(wv, xv, dxdqv, vols)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-13)

    def test_vector_and_weighted(self, rng_np):
        from thermoextrap_tpu.pipeline import (
            make_streaming_volume_pipeline,
            make_volume_pipeline,
        )

        wv, xv, dxdqv = self._data(rng_np, vec=True)
        w = rng_np.uniform(0.5, 1.5, len(wv))
        vols = np.array([1.9, 2.2])
        st, upd, prd = make_streaming_volume_pipeline(
            2.0, ndim=3, val_shape=(2,), dtype=np.float64
        )
        half = len(wv) // 2
        st = upd(st, wv[:half], xv[:half], dxdqv[:half], weight=w[:half])
        st = upd(st, wv[half:], xv[half:], dxdqv[half:], weight=w[half:])
        got = np.asarray(prd(st, vols))
        assert got.shape == (2, 2)
        ref = np.asarray(
            make_volume_pipeline(2.0, ndim=3, weighted=True)(
                wv, xv, dxdqv, vols, w
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-13)

    def test_bootstrap_ci(self, rng_np):
        from thermoextrap_tpu.pipeline import (
            make_streaming_volume_pipeline,
            make_volume_pipeline,
        )

        wv, xv, dxdqv = self._data(rng_np)
        vols = np.array([1.8, 2.3])
        st, upd, prd = make_streaming_volume_pipeline(
            2.0, ndim=3, nrep=200, dtype=np.float64, seed=7
        )
        for lo, hi in ((0, 2000), (2000, 4000)):
            st = upd(st, wv[lo:hi], xv[lo:hi], dxdqv[lo:hi])
        pred, std = prd(st, vols)
        ref = np.asarray(
            make_volume_pipeline(2.0, ndim=3)(wv, xv, dxdqv, vols)
        )
        np.testing.assert_allclose(np.asarray(pred), ref, rtol=1e-13)
        # CI calibrated against the one-shot pipeline's bootstrap
        _, std_ref = make_volume_pipeline(2.0, ndim=3, nrep=200)(
            wv, xv, dxdqv, vols, seed=3
        )
        ratio = np.asarray(std) / np.asarray(std_ref)
        assert np.all((0.6 < ratio) & (ratio < 1.7)), ratio

    def test_mesh_matches_unmeshed(self, rng_np):
        import jax
        import pytest

        from thermoextrap_tpu.parallel import make_mesh, shard_rec
        from thermoextrap_tpu.pipeline import make_streaming_volume_pipeline

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        wv, xv, dxdqv = self._data(rng_np, R=4096)
        vols = np.array([1.9, 2.2])
        mesh = make_mesh(8, axis_names=("rep", "rec"))
        stm, updm, prdm = make_streaming_volume_pipeline(
            2.0, ndim=3, dtype=np.float64, mesh=mesh, nrep=8, seed=5
        )
        stu, updu, prdu = make_streaming_volume_pipeline(
            2.0, ndim=3, dtype=np.float64, nrep=8, seed=5
        )
        half = len(wv) // 2
        for lo, hi in ((0, half), (half, len(wv))):
            stm = updm(
                stm,
                shard_rec(jnp.asarray(wv[lo:hi]), mesh),
                shard_rec(jnp.asarray(xv[lo:hi]), mesh),
                shard_rec(jnp.asarray(dxdqv[lo:hi]), mesh),
            )
            stu = updu(stu, wv[lo:hi], xv[lo:hi], dxdqv[lo:hi])
        for got, want in zip(prdm(stm, vols), prdu(stu, vols)):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-13
            )

    def test_shape_mismatch_error(self, rng_np):
        import pytest

        from thermoextrap_tpu.pipeline import make_streaming_volume_pipeline

        st, upd, _ = make_streaming_volume_pipeline(2.0)
        with pytest.raises(ValueError, match="must match"):
            upd(st, np.zeros(10), np.zeros(10), np.zeros((10, 2)))

    def test_jackknife_composes(self, rng_np):
        """streaming_jackknife works over per-chunk volume states (nrep=0
        states are plain DataCentralMoments, so merge/vmap compose)."""
        from thermoextrap_tpu.pipeline import (
            make_streaming_volume_pipeline,
            streaming_jackknife,
        )

        wv, xv, dxdqv = self._data(rng_np, R=4000)
        vols = np.array([1.8, 2.3])
        st0, upd, prd = make_streaming_volume_pipeline(
            2.0, ndim=3, dtype=np.float64
        )
        states = [
            upd(st0, wv[lo : lo + 500], xv[lo : lo + 500], dxdqv[lo : lo + 500])
            for lo in range(0, 4000, 500)
        ]
        pred, se = streaming_jackknife(states, prd, vols)
        full = states[0].merge(*states[1:])
        np.testing.assert_allclose(
            np.asarray(pred), np.asarray(prd(full, vols)), rtol=1e-13
        )
        assert np.all(np.asarray(se) > 0)


class TestStreamingPerturb:
    """Online-softmax streaming perturbation == one-shot stabilized
    reweight, for any chunking."""

    def _data(self, rng_np, R=3000):
        u = rng_np.normal(2.0, 0.6, R)
        x = 1.5 + 0.3 * (u - 2.0) + rng_np.normal(0, 0.2, R)
        return u, x

    def test_chunked_equals_one_shot(self, rng_np):
        from thermoextrap_tpu.pipeline import (
            make_perturb_pipeline,
            make_streaming_perturb_pipeline,
        )

        u, x = self._data(rng_np)
        betas = np.array([0.7, 1.0, 1.4])  # wide spread: max crossings
        st, update, predict = make_streaming_perturb_pipeline(
            1.0, betas, dtype=jnp.float64
        )
        # ragged chunks in an order that forces running-max rescales
        for lo, hi in ((0, 700), (700, 701), (701, 2200), (2200, 3000)):
            st = update(st, u[lo:hi], x[lo:hi])
        got = np.asarray(predict(st))
        want = np.asarray(make_perturb_pipeline(1.0)(u, x, betas))
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_chunking_invariance(self, rng_np):
        from thermoextrap_tpu.pipeline import make_streaming_perturb_pipeline

        u, x = self._data(rng_np, R=1000)
        betas = np.array([0.8, 1.3])
        preds = []
        for bounds in (((0, 1000),), ((0, 250), (250, 1000))):
            st, update, predict = make_streaming_perturb_pipeline(
                1.0, betas, dtype=jnp.float64
            )
            for lo, hi in bounds:
                st = update(st, u[lo:hi], x[lo:hi])
            preds.append(np.asarray(predict(st)))
        np.testing.assert_allclose(preds[0], preds[1], rtol=1e-13)

    def test_zero_weight_drops_exactly(self, rng_np):
        from thermoextrap_tpu.pipeline import make_streaming_perturb_pipeline

        u, x = self._data(rng_np, R=500)
        betas = np.array([1.1])
        st, update, predict = make_streaming_perturb_pipeline(
            1.0, betas, dtype=jnp.float64
        )
        st = update(st, u, x)
        base = np.asarray(predict(st))
        # a second, fully zero-weight chunk must change nothing
        st = update(st, u[:64] + 100.0, x[:64], weight=np.zeros(64))
        np.testing.assert_allclose(np.asarray(predict(st)), base, rtol=0)

    def test_vector_values_and_ci(self, rng_np):
        from thermoextrap_tpu.pipeline import (
            make_perturb_pipeline,
            make_streaming_perturb_pipeline,
        )

        u, _ = self._data(rng_np, R=2000)
        x = 1.5 + 0.3 * (u[:, None] - 2.0) + rng_np.normal(0, 0.2, (2000, 3))
        betas = np.array([0.95, 1.1])
        st, update, predict = make_streaming_perturb_pipeline(
            1.0, betas, val_shape=(3,), dtype=jnp.float64, nrep=200, seed=4
        )
        for lo, hi in ((0, 800), (800, 2000)):
            st = update(st, u[lo:hi], x[lo:hi])
        pred, std = predict(st)
        assert np.asarray(pred).shape == (2, 3)
        assert np.all(np.asarray(std) > 0)
        # one-shot CI (different draws): statistically compatible scale
        _, std_1 = make_perturb_pipeline(1.0, nrep=200)(u, x, betas, seed=9)
        ratio = np.asarray(std) / np.asarray(std_1)
        assert np.all(ratio > 0.5) and np.all(ratio < 2.0)

    def test_ci_replicate_keying_advances(self, rng_np):
        """Each chunk folds with its own PRNG draw (the step counter
        advances) — two identical chunks must NOT produce identical
        replicate increments."""
        from thermoextrap_tpu.pipeline import make_streaming_perturb_pipeline

        u, x = self._data(rng_np, R=300)
        st, update, _ = make_streaming_perturb_pipeline(
            1.0, np.array([1.0]), dtype=jnp.float64, nrep=16
        )
        st1 = update(st, u, x)
        st2 = update(st1, u, x)
        inc1 = np.asarray(st1[3])
        inc2 = np.asarray(st2[3]) - inc1  # second chunk's contribution
        assert not np.allclose(inc1, inc2)
        assert int(st2[5]) == 2
