"""Sharded reduction over an 8-device virtual CPU mesh must equal the
single-device two-pass reference exactly."""

import jax
import numpy as np
import pytest

from thermoextrap_tpu.ops.moments import reduce_central_comoments
from thermoextrap_tpu.ops.resample import (
    freq_from_indices,
    resample_central_comoments,
)
from thermoextrap_tpu.parallel import (
    make_mesh,
    reduce_central_comoments_sharded,
    resample_central_comoments_sharded,
    shard_rec,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, axis_names=("rec",))


@pytest.fixture(scope="module")
def mesh2d():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, axis_names=("rep", "rec"))


def test_reduce_sharded(mesh, rng_np):
    order, R, V = 6, 4096, 3
    u = rng_np.normal(5.0, 1.0, R)
    x = rng_np.normal(2.0, 0.5, (R, V))
    w = rng_np.uniform(0.5, 1.5, R)

    ref = reduce_central_comoments(u, x, order, weight=w)
    got = reduce_central_comoments_sharded(
        shard_rec(jax.numpy.asarray(u), mesh),
        shard_rec(jax.numpy.asarray(x), mesh),
        order,
        mesh,
        weight=w,
    )
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-14
        )


def test_resample_sharded(mesh2d, rng_np):
    order, R, V, nrep = 4, 1024, 2, 8
    u = rng_np.normal(3.0, 1.0, R)
    x = rng_np.normal(1.0, 0.5, (R, V))
    idx = rng_np.integers(0, R, (nrep, R))
    freq = freq_from_indices(idx, R)

    ref = resample_central_comoments(u, x, freq, order)
    got = resample_central_comoments_sharded(
        jax.numpy.asarray(u), jax.numpy.asarray(x), freq, order, mesh2d
    )
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12
        )


def test_pallas_interpret_matches_xla(rng_np):
    """Fused kernels (interpret mode) match the XLA reference."""
    from thermoextrap_tpu.ops.moments_pallas import (
        reduce_central_comoments_fused,
        resample_central_comoments_fused,
    )

    order, R, V = 6, 1000, 2
    u = rng_np.normal(5.0, 1.0, R).astype(np.float32)
    x = rng_np.normal(2.0, 0.5, (R, V)).astype(np.float32)

    ref = reduce_central_comoments(np.float64(u), np.float64(x), order)
    got = reduce_central_comoments_fused(u, x, order, interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b), rtol=2e-3, atol=1e-5
        )

    nrep = 5
    idx = rng_np.integers(0, R, (nrep, R))
    freq = np.asarray(freq_from_indices(idx, R))
    ref = resample_central_comoments(np.float64(u), np.float64(x), freq, order)
    got = resample_central_comoments_fused(u, x, freq, order, interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b), rtol=2e-3, atol=1e-5
        )


def test_poisson_bootstrap_interpret(rng_np):
    """In-kernel Poisson bootstrap (interpret mode): statistical sanity."""
    from thermoextrap_tpu.ops.moments_pallas import (
        resample_central_comoments_poisson,
    )

    R, nrep, order = 4000, 64, 4
    u = rng_np.normal(5.0, 1.0, R).astype(np.float32)
    x = rng_np.normal(2.0, 0.5, (R, 1)).astype(np.float32)
    try:
        xave, uave, du, dxdu = resample_central_comoments_poisson(
            u, x, nrep, order, seed=3, interpret=True
        )
    except NotImplementedError:
        pytest.skip("Pallas PRNG unsupported in interpret mode on this host")
    assert xave.shape == (nrep, 1)
    assert du.shape == (order + 1, nrep)
    # replicate means scatter around truth at ~1/sqrt(R)
    assert abs(float(np.asarray(uave).mean()) - u.mean()) < 5 * 1.0 / np.sqrt(R)
    # bootstrap std of the mean tracks the exact standard error
    sem = float(np.asarray(xave).std())
    assert 0.5 * 0.5 / np.sqrt(R) < sem < 2.0 * 0.5 / np.sqrt(R)
    np.testing.assert_allclose(np.asarray(du[0]), 1.0)
    np.testing.assert_allclose(np.asarray(du[1]), 0.0, atol=1e-12)

    # return_wsum: identical moments plus the per-replicate total weight
    # (the streaming accumulator's merge weight); Poisson(1) total ~ R
    xw, uw, duw, dxduw, wsum = resample_central_comoments_poisson(
        u, x, nrep, order, seed=3, interpret=True, return_wsum=True
    )
    np.testing.assert_array_equal(np.asarray(xw), np.asarray(xave))
    np.testing.assert_array_equal(np.asarray(duw), np.asarray(du))
    assert wsum.shape == (nrep,)
    w = np.asarray(wsum)
    assert np.all(np.abs(w - R) < 6 * np.sqrt(R)), w


def test_batched_umoments_interpret(rng_np):
    """Batched u-moment kernel (lnPi macrostate layout) vs the XLA two-pass
    reference, interpret mode."""
    from thermoextrap_tpu.ops.moments_pallas import (
        reduce_central_umoments_batched,
    )

    order, B, R = 5, 3, 2500
    u = rng_np.normal(-50.0, 2.0, (B, R)).astype(np.float32)
    w = rng_np.uniform(0.5, 1.5, (B, R)).astype(np.float32)
    uave, du = reduce_central_umoments_batched(u, order, weight=w, interpret=True)
    assert uave.shape == (B,)
    assert du.shape == (order + 1, B)
    for b in range(B):
        wsum = w[b].sum()
        ubar = (w[b] * np.float64(u[b])).sum() / wsum
        ref = np.stack(
            [(w[b] * (np.float64(u[b]) - ubar) ** n).sum() / wsum for n in range(order + 1)]
        )
        ref[0], ref[1] = 1.0, 0.0
        np.testing.assert_allclose(float(uave[b]), ubar, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(du[:, b], np.float64), ref, rtol=5e-3, atol=1e-4
        )


def test_batched_comoments_interpret(rng_np):
    """Batched x != u comoment kernel vs the XLA two-pass reference,
    interpret mode: multi-dim batch x multi-dim val, weighted, odd R tail."""
    from thermoextrap_tpu.ops.moments_pallas import (
        reduce_central_comoments_batched,
    )

    order, R = 5, 3001  # odd R exercises the tail mask
    for batch, val in [((3,), (2,)), ((2, 2), ()), ((4,), (2, 3))]:
        u = rng_np.normal(5.0, 1.0, (*batch, R)).astype(np.float32)
        x = rng_np.normal(2.0, 0.5, (*batch, R, *val)).astype(np.float32)
        w = rng_np.uniform(0.5, 1.5, (*batch, R)).astype(np.float32)

        ref = reduce_central_comoments(
            np.float64(u), np.float64(x), order, weight=np.float64(w),
            val_ndim=len(val),
        )
        got = reduce_central_comoments_batched(
            u, x, order, weight=w, interpret=True
        )
        for a, b in zip(got, ref):
            assert a.shape == b.shape
            np.testing.assert_allclose(
                np.asarray(a, np.float64), np.asarray(b), rtol=2e-3, atol=1e-5
            )

    # unweighted path
    u = rng_np.normal(5.0, 1.0, (3, R)).astype(np.float32)
    x = rng_np.normal(2.0, 0.5, (3, R, 2)).astype(np.float32)
    ref = reduce_central_comoments(np.float64(u), np.float64(x), order)
    got = reduce_central_comoments_batched(u, x, order, interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b), rtol=2e-3, atol=1e-5
        )


def test_fused_reduce_rejects_mixed_dtypes(rng_np):
    """bf16 opt-in must cover both streams; mixed dtypes raise instead of
    silently downcasting (or ignoring) one of them."""
    import jax.numpy as jnp

    from thermoextrap_tpu.ops.moments_pallas import (
        reduce_central_comoments_batched,
        reduce_central_comoments_fused,
    )

    u = jnp.asarray(rng_np.normal(0, 1, 256), jnp.float32)
    x = u.astype(jnp.bfloat16).reshape(256, 1)
    with pytest.raises(ValueError, match="mixed input dtypes"):
        reduce_central_comoments_fused(u, x, 2, interpret=True)
    with pytest.raises(ValueError, match="mixed input dtypes"):
        reduce_central_comoments_batched(
            u.reshape(2, 128), x.reshape(2, 128, 1), 2, interpret=True
        )


@pytest.mark.parametrize("r", [127, 128, 1024, 1025, 2048, 4096 + 512])
def test_fused_reduce_lane_shapes(rng_np, r):
    """The lanes-from-divisors packing (bitcast vs pad fallback, partial
    final grid block, where-masked tails) is exact for every R shape class:
    R<128 (pad), R=128/512-divisible (bitcast + partial block), R%128!=0
    (pad fallback)."""
    from thermoextrap_tpu.ops.moments_pallas import (
        reduce_central_comoments_fused,
    )

    order, v = 4, 2
    u = rng_np.normal(5.0, 1.0, r).astype(np.float32)
    x = rng_np.normal(2.0, 0.5, (r, v)).astype(np.float32)
    w = rng_np.uniform(0.5, 1.5, r).astype(np.float32)

    ref = reduce_central_comoments(
        np.float64(u), np.float64(x), order, weight=np.float64(w)
    )
    got = reduce_central_comoments_fused(
        u, x, order, weight=w, block=1024, interpret=True
    )
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b), rtol=2e-3, atol=1e-5
        )


@pytest.mark.parametrize(
    ("r", "nrep"), [(128, 5), (384, 130), (1024, 128), (1025, 5), (9216, 7)]
)
def test_fused_resample_lane_shapes(rng_np, r, nrep):
    """The bootstrap kernel's bitcast packing (int32 freq, partial rep and
    rec grid blocks, where-masked tails) is exact for every shape class."""
    from thermoextrap_tpu.ops.moments_pallas import (
        resample_central_comoments_fused,
    )

    order, v = 4, 2
    u = rng_np.normal(5.0, 1.0, r).astype(np.float32)
    x = rng_np.normal(2.0, 0.5, (r, v)).astype(np.float32)
    w = rng_np.uniform(0.5, 1.5, r).astype(np.float32)
    idx = rng_np.integers(0, r, (nrep, r))
    freq = np.asarray(freq_from_indices(idx, r))

    ref = resample_central_comoments(
        np.float64(u), np.float64(x), freq, order, weight=np.float64(w)
    )
    got = resample_central_comoments_fused(
        u, x, freq.astype(np.int32), order, weight=w, interpret=True
    )
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b), rtol=2e-3, atol=1e-4
        )


@pytest.mark.parametrize("r", [127, 1025, 12_832])
@pytest.mark.parametrize("weighted", [False, True])
def test_fused_reduce_flat1d_misaligned(rng_np, r, weighted):
    """v==1 misaligned-R streams take the flat-1D block path (no host-side
    pad copy; in-kernel ``(blk,) -> (rows, lanes)`` reshape) — exact vs the
    f64 two-pass reference for sub-block, one-block-plus-tail, and
    multi-block-plus-tail shapes, weighted and unweighted."""
    from thermoextrap_tpu.ops.moments_pallas import (
        reduce_central_comoments_fused,
    )

    order = 4
    u = rng_np.normal(5.0, 1.0, r).astype(np.float32)
    x = rng_np.normal(2.0, 0.5, (r, 1)).astype(np.float32)
    w = rng_np.uniform(0.5, 1.5, r).astype(np.float32) if weighted else None

    ref = reduce_central_comoments(
        np.float64(u),
        np.float64(x),
        order,
        weight=None if w is None else np.float64(w),
    )
    got = reduce_central_comoments_fused(
        u, x, order, weight=w, block=1024, interpret=True
    )
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b), rtol=2e-3, atol=1e-5
        )


def test_fused_resample_fractional_freq(rng_np):
    """Float (fractional-weight) frequency tables — e.g. Bayesian-bootstrap
    Dirichlet weights — must NOT be truncated to integers."""
    from thermoextrap_tpu.ops.moments_pallas import (
        resample_central_comoments_fused,
    )

    order, r, nrep = 3, 512, 8
    u = rng_np.normal(5.0, 1.0, r).astype(np.float32)
    x = rng_np.normal(2.0, 0.5, (r, 1)).astype(np.float32)
    freq = (rng_np.dirichlet(np.ones(r), size=nrep) * r).astype(np.float64)

    ref = resample_central_comoments(np.float64(u), np.float64(x), freq, order)
    got = resample_central_comoments_fused(u, x, freq, order, interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b), rtol=2e-3, atol=1e-4
        )


def test_batched_umoments_custom_vjp(rng_np):
    """Gradients through the batched u-moment kernel == autodiff of the
    XLA two-pass formulation (the lnPi pipeline's fast path)."""
    import jax
    import jax.numpy as jnp

    from thermoextrap_tpu.ops import moments_pallas as mp

    order, B, R = 4, 3, 400
    u = jnp.asarray(rng_np.normal(2.0, 1.0, (B, R)))
    w = jnp.asarray(rng_np.uniform(0.5, 1.5, (B, R)))

    def scalar(out):
        uave, du = out
        return jnp.sum(jnp.sin(uave)) + jnp.sum(
            du**2 * jnp.arange(1.0, 1.0 + du.size).reshape(du.shape)
        )

    g_ref = jax.grad(
        lambda u, w: scalar(mp._u_batched_xla(u, w, order)), argnums=(0, 1)
    )(u, w)

    orig = mp.reduce_central_umoments_batched
    mp.reduce_central_umoments_batched = lambda uu, oo, weight=None: orig(
        uu, oo, weight=weight, interpret=True
    )
    try:
        g_fused = jax.grad(
            lambda u, w: scalar(
                mp.reduce_central_umoments_batched_ad(u, w, order)
            ),
            argnums=(0, 1),
        )(u, w)
    finally:
        mp.reduce_central_umoments_batched = orig

    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
        )


def test_batched_comoments_custom_vjp(rng_np):
    """Gradients through the batched fused kernel == autodiff through the
    XLA two-pass formulation."""
    import jax
    import jax.numpy as jnp

    from thermoextrap_tpu.ops import moments_pallas as mp

    order, B, R, V = 3, 2, 300, 2
    u = jnp.asarray(rng_np.normal(2.0, 1.0, (B, R)))
    x = jnp.asarray(rng_np.normal(1.0, 0.5, (B, R, V)))
    w = jnp.asarray(rng_np.uniform(0.5, 1.5, (B, R)))

    def scalar(out):
        xave, uave, du, dxdu = out
        return (
            jnp.sum(jnp.sin(xave))
            + jnp.sum(uave)
            + jnp.sum(du**2)
            + jnp.sum(dxdu * jnp.arange(1.0, 1.0 + dxdu.size).reshape(dxdu.shape))
        )

    g_ref = jax.grad(
        lambda u, x, w: scalar(
            reduce_central_comoments(u, x, order, weight=w)
        ),
        argnums=(0, 1, 2),
    )(u, x, w)

    orig = mp.reduce_central_comoments_batched
    mp.reduce_central_comoments_batched = lambda uu, xx, oo, weight=None: orig(
        uu, xx, oo, weight=weight, interpret=True
    )
    try:
        g_fused = jax.grad(
            lambda u, x, w: scalar(
                mp.reduce_central_comoments_batched_ad(u, x, w, order)
            ),
            argnums=(0, 1, 2),
        )(u, x, w)
    finally:
        mp.reduce_central_comoments_batched = orig

    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
        )


def test_fused_reduce_custom_vjp(rng_np):
    """Cotangents of the fused kernel's custom VJP == autodiff through the
    XLA reference implementation."""
    import jax
    import jax.numpy as jnp

    from thermoextrap_tpu.ops.moments_pallas import (
        reduce_central_comoments_fused_ad,
    )

    order, R, V = 4, 300, 2
    u = jnp.asarray(rng_np.normal(2.0, 1.0, R))
    x = jnp.asarray(rng_np.normal(1.0, 0.5, (R, V)))
    w = jnp.asarray(rng_np.uniform(0.5, 1.5, R))

    def loss_ref(u, x, w):
        xave, uave, du, dxdu = reduce_central_comoments(u, x, order, weight=w)
        return (
            jnp.sum(jnp.sin(xave))
            + 2.0 * uave
            + jnp.sum(du**2)
            + jnp.sum(dxdu * jnp.arange(1.0, 1.0 + dxdu.size).reshape(dxdu.shape))
        )

    def loss_fused(u, x, w):
        xave, uave, du, dxdu = reduce_central_comoments_fused_ad(u, x, w, order)
        return (
            jnp.sum(jnp.sin(xave))
            + 2.0 * uave
            + jnp.sum(du**2)
            + jnp.sum(dxdu * jnp.arange(1.0, 1.0 + dxdu.size).reshape(dxdu.shape))
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(u, x, w)
    # patch the fused forward to interpret mode on CPU via dispatch of the
    # XLA forward inside the custom_vjp: easiest is monkeypatching the
    # forward used by the wrapper
    import thermoextrap_tpu.ops.moments_pallas as mp

    orig = mp.reduce_central_comoments_fused
    mp.reduce_central_comoments_fused = lambda uu, xx, oo, weight=None: orig(
        uu, xx, oo, weight=weight, interpret=True
    )
    try:
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(u, x, w)
    finally:
        mp.reduce_central_comoments_fused = orig

    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
        )


def test_fused_resample_custom_vjp(rng_np):
    """Gradients through the fused bootstrap == autodiff through the XLA
    formulation."""
    import jax
    import jax.numpy as jnp

    from thermoextrap_tpu.ops import moments_pallas as mp

    order, R, V, nrep = 3, 200, 2, 6
    u = jnp.asarray(rng_np.normal(2.0, 1.0, R))
    x = jnp.asarray(rng_np.normal(1.0, 0.5, (R, V)))
    idx = rng_np.integers(0, R, (nrep, R))
    freq = freq_from_indices(idx, R)

    def scalar(out):
        xave, uave, du, dxdu = out
        return (
            jnp.sum(xave * jnp.arange(1.0, 1.0 + xave.size).reshape(xave.shape))
            + jnp.sum(uave)
            + jnp.sum(du**2)
            + jnp.sum(dxdu)
        )

    g_ref = jax.grad(
        lambda u, x: scalar(resample_central_comoments(u, x, freq, order))
    , argnums=(0, 1))(u, x)

    orig = mp.resample_central_comoments_fused
    mp.resample_central_comoments_fused = (
        lambda uu, xx, ff, oo, weight=None: orig(
            uu, xx, ff, oo, weight=weight, interpret=True
        )
    )
    try:
        g_fused = jax.grad(
            lambda u, x: scalar(
                mp.resample_central_comoments_fused_ad(u, x, freq, order)
            ),
            argnums=(0, 1),
        )(u, x)
    finally:
        mp.resample_central_comoments_fused = orig

    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5)


def test_bf16_reduce_accuracy(rng_np):
    """bf16-input fused reduce accuracy gate (justifies the bf16 bench
    headline):

    (i) the kernel matches exact f64 moments of the *quantized* data —
        in-kernel accumulation is f32 regardless of input dtype;
    (ii) the quantization effect itself (f64 moments of quantized vs
         unquantized data) matches the delta-method prediction
         ``E[(a+q)^n] - E[a^n] ~ C(n,2) du_{n-2} E[q^2]`` within 5x and
         stays below a few sampling-noise sigma of the estimator.
    """
    import math

    import jax.numpy as jnp

    from thermoextrap_tpu.ops.moments_pallas import (
        reduce_central_comoments_fused,
    )

    R, order = 400_000, 6
    u = rng_np.normal(5.0, 1.0, R).astype(np.float32)
    x = (2.0 + 0.3 * (u - 5.0) + rng_np.normal(0, 0.5, R)).astype(np.float32)[
        :, None
    ]

    u16 = np.asarray(
        jnp.asarray(u).astype(jnp.bfloat16).astype(jnp.float32), np.float64
    )
    x16 = np.asarray(
        jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32), np.float64
    )

    # (i) kernel (bf16 stream, f32 accumulate) vs exact f64 of quantized data
    got = reduce_central_comoments_fused(
        jnp.asarray(u).astype(jnp.bfloat16),
        jnp.asarray(x).astype(jnp.bfloat16),
        order,
        interpret=True,
    )
    ref16 = reduce_central_comoments(u16, x16, order)
    for a, b in zip(got, ref16):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b), rtol=2e-3, atol=2e-5
        )

    # (ii) quantization shift: f64(quantized) vs f64(original)
    ref32 = reduce_central_comoments(np.float64(u), np.float64(x), order)
    du16, du32 = np.asarray(ref16[2], float), np.asarray(ref32[2], float)
    dx16 = np.asarray(ref16[3], float).ravel()
    dx32 = np.asarray(ref32[3], float).ravel()
    q2_u = float(np.mean((np.float64(u) - u16) ** 2))
    q2_x = float(np.mean((np.float64(x) - x16) ** 2))

    a = np.float64(u) - u.mean()
    s = np.float64(x[:, 0]) - x[:, 0].mean()
    for n in range(2, order + 1):
        bias_u = math.comb(n, 2) * abs(du32[n - 2]) * q2_u
        sigma_u = float(np.std(a**n)) / np.sqrt(R)
        assert abs(du16[n] - du32[n]) < 5.0 * bias_u + 3.0 * sigma_u, n

        bias_x = (
            math.comb(n, 2) * abs(dx32[n - 2]) * q2_u
            + n * abs(du32[n - 1]) * np.sqrt(q2_x * q2_u)
            + abs(du32[n]) * 0.0
        )
        sigma_x = float(np.std(s * a**n)) / np.sqrt(R)
        assert abs(dx16[n] - dx32[n]) < 5.0 * bias_x + 3.0 * sigma_x + np.sqrt(
            q2_x
        ) * sigma_u, n


def test_reduce_umoments_batched_sharded(mesh, rng_np):
    """Batched sharded u-moment reduce == single-device two-pass, exactly."""
    from thermoextrap_tpu.parallel import reduce_central_umoments_batched_sharded

    order, nbatch, R = 5, 6, 2048
    u = rng_np.normal(3.0, 1.0, (nbatch, R))
    w = rng_np.uniform(0.5, 1.5, (nbatch, R))

    # independent per-batch two-pass reference
    ref_uave = (w * u).sum(-1) / w.sum(-1)
    d = u - ref_uave[:, None]
    ref_du = [np.ones(nbatch), np.zeros(nbatch)]
    for n in range(2, order + 1):
        ref_du.append((w * d**n).sum(-1) / w.sum(-1))
    ref_du = np.stack(ref_du)

    uave, du = reduce_central_umoments_batched_sharded(
        jax.numpy.asarray(u), order, mesh, weight=jax.numpy.asarray(w)
    )
    np.testing.assert_allclose(np.asarray(uave), ref_uave, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(du), ref_du, rtol=1e-11, atol=1e-14)


def test_resample_umoments_batched_sharded(mesh2d, rng_np):
    """Batched sharded u-moment bootstrap == the XLA freq-table path."""
    from thermoextrap_tpu.ops.resample import resample_central_umoments_batched
    from thermoextrap_tpu.parallel import (
        resample_central_umoments_batched_sharded,
    )

    order, nbatch, R, nrep = 4, 5, 1024, 8
    u = rng_np.normal(2.0, 1.0, (nbatch, R))
    idx = rng_np.integers(0, R, (nrep, R))
    freq = freq_from_indices(idx, R)

    ref_u, ref_du = resample_central_umoments_batched(u, freq, order)
    got_u, got_du = resample_central_umoments_batched_sharded(
        jax.numpy.asarray(u), freq, order, mesh2d
    )
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(got_du), np.asarray(ref_du), rtol=1e-9, atol=1e-12
    )


def test_resample_umoments_batched_xla(rng_np):
    """Freq-table batched u-moment bootstrap == per-replicate direct
    two-pass over explicitly materialized resampled values."""
    from thermoextrap_tpu.ops.resample import resample_central_umoments_batched

    order, nbatch, R, nrep = 4, 3, 256, 6
    u = rng_np.normal(1.0, 2.0, (nbatch, R))
    idx = rng_np.integers(0, R, (nrep, R))
    freq = np.asarray(freq_from_indices(idx, R))

    got_u, got_du = resample_central_umoments_batched(u, freq, order)
    for p in range(nrep):
        res = u[:, idx[p]]  # (nbatch, R) resampled values
        ref_uave = res.mean(-1)
        d = res - ref_uave[:, None]
        np.testing.assert_allclose(np.asarray(got_u[p]), ref_uave, rtol=1e-10)
        for n in range(2, order + 1):
            np.testing.assert_allclose(
                np.asarray(got_du[n, p]), (d**n).mean(-1), rtol=1e-8, atol=1e-12
            )


def test_poisson_umoments_batched_interpret(rng_np):
    """Batched in-kernel Poisson u-moment bootstrap (interpret mode):
    frequencies are shared across batch rows and statistically sane."""
    from thermoextrap_tpu.ops.moments_pallas import (
        resample_central_umoments_batched_poisson,
    )

    order, nbatch, R, nrep = 4, 3, 1024, 64
    base = rng_np.normal(2.0, 1.0, R)
    # identical sample streams in every batch row: shared frequencies must
    # then give IDENTICAL replicate moments across the batch axis
    u = np.broadcast_to(base, (nbatch, R)).copy()
    try:
        uave, du = resample_central_umoments_batched_poisson(
            u, nrep, order, seed=7, interpret=True
        )
    except Exception:
        pytest.skip("Pallas PRNG unsupported in interpret mode on this host")
    uave = np.asarray(uave)
    du = np.asarray(du)
    assert uave.shape == (nrep, nbatch)
    assert du.shape == (order + 1, nrep, nbatch)
    for b in range(1, nbatch):
        np.testing.assert_allclose(uave[:, b], uave[:, 0], rtol=1e-6)
        np.testing.assert_allclose(du[2:, :, b], du[2:, :, 0], rtol=1e-5)
    # bootstrap means track the full-sample moments
    np.testing.assert_allclose(uave[:, 0].mean(), base.mean(), atol=0.15)
    np.testing.assert_allclose(
        du[2, :, 0].mean(), base.var(), rtol=0.2
    )
    # replicate scatter is plausibly positive (not degenerate)
    assert uave[:, 0].std() > 1e-4

    # return_wsum: identical moments plus the per-replicate resampled
    # weight (the streaming lnPi accumulator's merge weight), Poisson(1)
    # total ~ R and shared across the grid rows
    # multi-group + batch-pad paths (gb < nbatch, nbp != nbatch): with
    # group_rows=2 the 3 rows span two groups and one pad row; the draw
    # schedule is gb-invariant, so results match the default grouping
    # exactly up to f32 dot association
    ua2, du2g = resample_central_umoments_batched_poisson(
        u, nrep, order, seed=7, interpret=True, group_rows=2
    )
    np.testing.assert_allclose(np.asarray(ua2), uave, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(du2g)[2:], du[2:], rtol=1e-5)

    uw, duw, wsum = resample_central_umoments_batched_poisson(
        u, nrep, order, seed=7, interpret=True, return_wsum=True
    )
    np.testing.assert_array_equal(np.asarray(uw), uave)
    np.testing.assert_array_equal(np.asarray(duw), du)
    assert wsum.shape == (nrep, nbatch)
    w = np.asarray(wsum)
    for b in range(1, nbatch):
        np.testing.assert_allclose(w[:, b], w[:, 0], rtol=1e-7)
    assert np.all(np.abs(w[:, 0] - R) < 6 * np.sqrt(R)), w[:, 0]


class TestPerturbKernels:
    """The fused perturbation-bootstrap kernels (VERDICT r4 item 1) vs the
    XLA einsum path (pipeline._perturb_boot) on the SAME freq table and
    the SAME streamed e rows — sums must agree to f32 dot association."""

    R, V, A, nrep = 1000, 2, 5, 16

    def _case(self, rng_np, weighted=False, v=None):
        import jax
        import jax.numpy as jnp

        v = self.V if v is None else v
        u = rng_np.normal(3.0, 1.0, self.R).astype(np.float32)
        x = rng_np.normal(1.0, 0.5, (self.R, v)).astype(np.float32)
        w = (
            rng_np.uniform(0.2, 2.0, self.R).astype(np.float32)
            if weighted
            else None
        )
        dalpha = np.linspace(-0.3, 0.3, self.A).astype(np.float32)
        logw = -dalpha[:, None] * u[None, :]
        if w is not None:
            logw = logw + np.where(
                w > 0, np.log(np.where(w > 0, w, 1.0)), -np.inf
            )[None, :]
        e = np.exp(logw - logw.max(axis=1, keepdims=True)).astype(np.float32)
        from thermoextrap_tpu.ops.resample import poisson1_freq

        freq = poisson1_freq(
            jax.random.key(11), (self.nrep, self.R), dtype=jnp.int8
        )
        xe = np.concatenate([x, np.ones((self.R, 1), np.float32)], axis=1)
        y = e[:, :, None].astype(np.float64) * xe[None].astype(np.float64)
        want = np.einsum("nr,arv->anv", np.asarray(freq, np.float64), y)
        return e, x, freq, want

    def test_freq_kernel_matches_oracle(self, rng_np):
        from thermoextrap_tpu.ops.moments_pallas import resample_perturb_freq

        e, x, freq, want = self._case(rng_np)
        got = np.asarray(resample_perturb_freq(e, x, freq, interpret=True))
        assert got.shape == (self.A, self.nrep, self.V + 1)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)

    def test_freq_kernel_weighted_e(self, rng_np):
        """Weights fold into e on the XLA side; zero weights are exact
        zero rows of e and contribute nothing."""
        from thermoextrap_tpu.ops.moments_pallas import resample_perturb_freq

        e, x, freq, want = self._case(rng_np, weighted=True)
        e[:, ::7] = 0.0
        xe = np.concatenate([x, np.ones((self.R, 1), np.float32)], axis=1)
        want = np.einsum(
            "nr,arv->anv",
            np.asarray(freq, np.float64),
            e[:, :, None].astype(np.float64) * xe[None].astype(np.float64),
        )
        got = np.asarray(resample_perturb_freq(e, x, freq, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)

    def test_freq_kernel_v1_and_out_group(self, rng_np):
        """V=1 packing + a tiny out_group (multi-partial path) both hold."""
        from thermoextrap_tpu.ops.moments_pallas import resample_perturb_freq

        e, x, freq, want = self._case(rng_np, v=1)
        for og in (1, 2, 64):
            got = np.asarray(
                resample_perturb_freq(e, x, freq, out_group=og, interpret=True)
            )
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)

    def test_poisson_kernel_interpret(self, rng_np):
        """In-kernel-PRNG variant: statistical sanity only (the draw
        stream is the Pallas PRNG's own; count parity is with the flat
        moment kernel, gated on chip)."""
        from thermoextrap_tpu.ops.moments_pallas import (
            resample_perturb_poisson,
        )

        e, x, freq, want = self._case(rng_np)
        try:
            got = np.asarray(
                resample_perturb_poisson(
                    e, x, self.nrep, seed=3, interpret=True
                )
            )
        except Exception:
            pytest.skip("Pallas PRNG unsupported in interpret mode here")
        assert got.shape == (self.A, self.nrep, self.V + 1)
        pred = got[..., : self.V] / got[..., self.V :]
        full = (e @ x) / e.sum(1)[:, None]
        np.testing.assert_allclose(
            pred.mean(axis=1), full, rtol=0.05, atol=0.05
        )

    def test_prep_guard(self, rng_np):
        from thermoextrap_tpu.ops.moments_pallas import resample_perturb_freq

        e = np.ones((200, 64), np.float32)
        x = rng_np.normal(size=(64, 3)).astype(np.float32)
        freq = np.ones((4, 64), np.int8)
        with pytest.raises(ValueError, match="512-row block budget"):
            resample_perturb_freq(e, x, freq, interpret=True)


def test_batch_group_arithmetic():
    """Pure-XLA oracle for the grouped grid-Poisson kernel's gb/nbp
    selection and batch-pad packing (ADVICE r4: the interpret-mode kernel
    test skips on hosts without Pallas interpret PRNG, so the divisor/pad
    arithmetic needs chip-free coverage)."""
    import jax.numpy as jnp

    from thermoextrap_tpu.ops.moments_pallas import (
        _batch_group_size,
        _pad_pack_batch,
    )

    # invariants over a broad sweep: gb | nbp, nbp >= nbatch, the group's
    # contribution rows fit the 128 MXU rows, and pads only engage when
    # nbatch has no usable divisor under the cap
    for nbatch in (1, 2, 3, 7, 12, 25, 64, 127, 128, 512, 1000):
        for order in (1, 2, 4, 6):
            gb, nbp = _batch_group_size(nbatch, order)
            cap = max(1, min(nbatch, 128 // (order + 1)))
            assert 1 <= gb <= cap
            assert nbp % gb == 0 and nbp >= nbatch
            assert gb * (order + 1) <= 128 or nbatch * (order + 1) <= 128
            if nbatch % gb == 0:
                assert nbp == nbatch  # divisor grouping never pads

    # divisor preference: largest divisor under the cap wins
    assert _batch_group_size(12, 6) == (12, 12)  # cap 18, 12 | 12
    assert _batch_group_size(64, 6) == (16, 64)  # cap 18, best divisor 16
    # prime nbatch > cap: falls to the cap and pads to the next multiple
    gb, nbp = _batch_group_size(127, 6)
    assert gb == 18 and nbp == 144
    # tiny prime <= cap groups whole (divisor = nbatch itself)
    assert _batch_group_size(7, 6) == (7, 7)
    # explicit override is honored verbatim
    assert _batch_group_size(3, 4, group_rows=2) == (2, 4)

    # packing: rec pad zeros, batch pad rows replicate row 0, block layout
    # (nbp, rp//lanes, lanes), and slicing the pads off recovers the input
    lanes = 128
    a = jnp.arange(3 * 200, dtype=jnp.float32).reshape(3, 200)
    rp = ((200 + 1023) // 1024) * 1024
    packed = _pad_pack_batch(a, rp, 4, lanes)
    assert packed.shape == (4, rp // lanes, lanes)
    flat = np.asarray(packed).reshape(4, rp)
    np.testing.assert_array_equal(flat[:3, :200], np.asarray(a))
    np.testing.assert_array_equal(flat[:3, 200:], 0.0)
    np.testing.assert_array_equal(flat[3], flat[0])  # pad row = row 0
    # no-pad path is a pure reshape (shape/content identity)
    b = jnp.arange(2 * 1024, dtype=jnp.float32).reshape(2, 1024)
    packed2 = _pad_pack_batch(b, 1024, 2, lanes)
    np.testing.assert_array_equal(
        np.asarray(packed2).reshape(2, 1024), np.asarray(b)
    )


def test_bf16_bootstrap_interpret(rng_np):
    """bf16 sample streams through the freq-matmul bootstrap kernel
    (interpret mode): replicate moments match the f32 kernel run on the
    pre-quantized data exactly (accumulation is f32 either way), and match
    the unquantized f32 path to bf16-quantization accuracy."""
    import jax.numpy as jnp

    from thermoextrap_tpu.ops.moments_pallas import (
        resample_central_comoments_fused,
    )

    order, R, nrep = 4, 1000, 6
    u = rng_np.normal(3.0, 1.0, R).astype(np.float32)
    x = rng_np.normal(1.0, 0.5, (R, 2)).astype(np.float32)
    idx = rng_np.integers(0, R, (nrep, R))
    freq = np.asarray(freq_from_indices(idx, R))

    u16 = jnp.asarray(u).astype(jnp.bfloat16)
    x16 = jnp.asarray(x).astype(jnp.bfloat16)
    got = resample_central_comoments_fused(u16, x16, freq, order, interpret=True)
    ref_q = resample_central_comoments_fused(
        u16.astype(jnp.float32), x16.astype(jnp.float32), freq, order,
        interpret=True,
    )
    for a, b in zip(got, ref_q):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        )
    ref = resample_central_comoments_fused(u, x, freq, order, interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-2, atol=2e-2
        )

    # mixed dtypes must be rejected, not silently downcast
    with pytest.raises(ValueError, match="mixed input dtypes"):
        resample_central_comoments_fused(
            u16, jnp.asarray(x), freq, order, interpret=True
        )


def test_zero_weight_head_no_nan(rng_np):
    """A zero-weight prefix (burn-in masked by weight=0) longer than the
    shift-estimate head must NOT poison the fused kernels with 0/0 = NaN
    (the shift falls back to 0; recentering stays exact)."""
    from thermoextrap_tpu.ops.moments_pallas import (
        reduce_central_comoments_fused,
        reduce_central_umoments_batched,
    )

    order, R = 4, 10_000
    u = rng_np.normal(2.0, 1.0, R).astype(np.float32)
    x = rng_np.normal(1.0, 0.5, (R, 1)).astype(np.float32)
    w = np.zeros(R, np.float32)
    w[9_000:] = 1.0  # the 8192-sample head is entirely zero-weight

    ref = reduce_central_comoments(
        np.float64(u), np.float64(x), order, weight=np.float64(w)
    )
    got = reduce_central_comoments_fused(u, x, order, weight=w, interpret=True)
    for a, b in zip(got, ref):
        assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b), rtol=5e-3, atol=1e-4
        )

    ub = np.stack([u, u + 1.0])
    wb = np.stack([w, w])
    uave, du = reduce_central_umoments_batched(
        ub, order, weight=wb, interpret=True
    )
    assert np.all(np.isfinite(np.asarray(uave)))
    assert np.all(np.isfinite(np.asarray(du)))
    np.testing.assert_allclose(
        float(np.asarray(uave)[0]), float(u[9_000:].mean()), rtol=5e-5
    )


def test_flat_x_is_u_umoment_kernel_route(rng_np):
    """The batched u-moment kernel accepts flat (R,) input — the dispatch
    x_is_u route that halves stream traffic vs running the comoment kernel
    on two copies of u (dispatch keys on an explicit flag because `xv is
    uv` is always False under jit tracing)."""
    from thermoextrap_tpu.ops import dispatch
    from thermoextrap_tpu.ops.moments_pallas import (
        reduce_central_umoments_batched,
    )

    order, R = 4, 3000
    u = rng_np.normal(5.0, 1.0, R).astype(np.float32)
    uave, du = reduce_central_umoments_batched(u, order + 1, interpret=True)
    assert uave.shape == ()
    assert du.shape == (order + 2,)
    ref_x, ref_u, ref_du, ref_dxdu = reduce_central_comoments(
        np.float64(u), np.float64(u), order, val_ndim=0
    )
    np.testing.assert_allclose(float(uave), float(ref_u), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(du[: order + 1], np.float64), np.asarray(ref_du),
        rtol=2e-3, atol=1e-5,
    )
    # the contract dispatch builds from the shift view: dxdu[n] = du[n+1]
    np.testing.assert_allclose(
        np.asarray(du[1 : order + 2], np.float64), np.asarray(ref_dxdu),
        rtol=2e-3, atol=1e-4,
    )
    # the XLA fallback honors the explicit flag too (identical contract)
    got = dispatch.reduce_central(u, u, order, x_is_u=True, val_ndim=0)
    for a, b in zip(got, (ref_x, ref_u, ref_du, ref_dxdu)):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_u_batched_xla_order0_shape():
    """order=0 must emit one moment row, not the [ones, zeros] seed pair
    (the AD wrapper's backward reference must match du's shape)."""
    from thermoextrap_tpu.ops.moments_pallas import _u_batched_xla

    u = jax.numpy.asarray(np.random.default_rng(0).normal(0, 1, (3, 100)))
    uave, du = _u_batched_xla(u, None, 0)
    assert du.shape == (1, 3)
    uave1, du1 = _u_batched_xla(u, None, 1)
    assert du1.shape == (2, 3)
