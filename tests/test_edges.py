"""Edge-case robustness: degenerate orders, tiny data, single replicates."""

import numpy as np
import pytest

import thermoextrap_tpu as xtpu
from thermoextrap_tpu import beta as beta_xpan


@pytest.fixture
def small(rng_np):
    u = rng_np.normal(2.0, 1.0, 32)
    x = rng_np.normal(1.0, 0.5, (32, 1))
    return u, x


def test_order_zero_extrapolation(small):
    """Order 0: prediction is the sample mean everywhere."""
    u, x = small
    data = xtpu.factory_data_values(uv=u, xv=x, order=0, central=True)
    model = beta_xpan.factory_extrapmodel(1.0, data)
    p1 = np.asarray(model.predict(1.0))
    p2 = np.asarray(model.predict(5.0))
    np.testing.assert_allclose(p1, p2, rtol=1e-12)
    np.testing.assert_allclose(p1[0], x.mean(), rtol=1e-12)


def test_order_one(small):
    """Order 1: the classic -cov(x, u) first derivative."""
    u, x = small
    data = xtpu.factory_data_values(uv=u, xv=x, order=1, central=True)
    model = beta_xpan.factory_extrapmodel(1.0, data)
    derivs = np.asarray(model.derivs())
    cov = ((x[:, 0] - x.mean()) * (u - u.mean())).mean()
    np.testing.assert_allclose(derivs[1, 0], -cov, rtol=1e-10)


def test_single_bootstrap_replicate(small):
    u, x = small
    data = xtpu.DataCentralMomentsVals.from_vals(x, u, 2)
    boot = data.resample({"nrep": 1})
    m = beta_xpan.factory_extrapmodel(1.0, boot)
    assert np.asarray(m.predict(1.1)).shape == (1, 1)


def test_tiny_dataset():
    """Fewer samples than moment order still computes (garbage-in fine)."""
    u = np.array([1.0, 2.0, 3.0])
    x = np.array([[0.5], [1.5], [2.5]])
    data = xtpu.factory_data_values(uv=u, xv=x, order=2, central=True)
    m = beta_xpan.factory_extrapmodel(0.5, data)
    assert np.isfinite(np.asarray(m.predict(0.6))).all()


def test_scalar_observable_no_val_axis(small):
    """xv with no val axis at all (pure scalar observable)."""
    u, x = small
    data = xtpu.factory_data_values(uv=u, xv=x[:, 0], order=3, central=True)
    m = beta_xpan.factory_extrapmodel(1.0, data)
    out = np.asarray(m.predict(np.array([0.9, 1.1])))
    assert out.shape == (2,)


def test_weight_zero_samples_excluded(small):
    """Zero-weighted samples must not contribute."""
    u, x = small
    w = np.ones_like(u)
    w[10:] = 0.0
    d_w = xtpu.factory_data_values(uv=u, xv=x, order=3, central=True, weight=w)
    d_t = xtpu.factory_data_values(uv=u[:10], xv=x[:10], order=3, central=True)
    for a, b in zip(d_w.derivs_args, d_t.derivs_args):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-12)


def test_interp_single_state_collection_order():
    """StateCollection.order is the min across states."""
    rng = np.random.default_rng(0)

    def mk(order, b):
        u = rng.normal(size=50)
        x = rng.normal(size=(50, 1))
        d = xtpu.factory_data_values(uv=u, xv=x, order=order, central=True)
        return beta_xpan.factory_extrapmodel(b, d)

    sc = xtpu.StateCollection([mk(2, 0.5), mk(4, 1.5)])
    assert sc.order == 2


def test_n_indexed_order_overflow_raises(rng_np):
    """n-indexed observables need moments up to n + order; JAX clamps
    out-of-bounds static indices, so the factory must reject the overflow
    instead of silently reusing the last moment entry."""
    u = rng_np.normal(2.0, 1.0, 64)

    # x_is_u raw data, order 4 -> u has entries 0..5 (shift trick adds one)
    d_raw = xtpu.DataValues.from_vals(None, u, order=4, central=False, x_is_u=True)
    with pytest.raises(ValueError, match="moment entries"):
        beta_xpan.factory_extrapmodel(1.0, d_raw, name="un_ave", n=3)
    # n + order = 5 = data.order + 1 is exactly satisfiable with x_is_u
    m = beta_xpan.factory_extrapmodel(1.0, d_raw, name="un_ave", n=3, order=2)
    assert np.isfinite(np.asarray(m.derivs())).all()

    d_cen = xtpu.DataValues.from_vals(None, u, order=4, central=True, x_is_u=True)
    with pytest.raises(ValueError, match="moment entries"):
        beta_xpan.factory_extrapmodel(1.0, d_cen, name="dun_ave", n=2)

    # x != u comoments carry no shift: n + order must be <= data.order
    x = rng_np.normal(1.0, 0.5, (64, 1))
    d_x = xtpu.factory_data_values(uv=u, xv=x, order=4, central=False)
    with pytest.raises(ValueError, match="moment entries"):
        beta_xpan.factory_extrapmodel(1.0, d_x, name="xun_ave", n=1)
    m2 = beta_xpan.factory_extrapmodel(1.0, d_x, name="xun_ave", n=1, order=3)
    assert np.isfinite(np.asarray(m2.derivs())).all()


def test_compilation_cache_roundtrip(tmp_path):
    """enable_compilation_cache writes reusable entries (CPU backend;
    the axon-backend speedup is recorded in COMPILE_CACHE.json)."""
    import jax
    import jax.numpy as jnp

    from thermoextrap_tpu.utils.compile_cache import enable_compilation_cache

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        cache = enable_compilation_cache(tmp_path / "xla")
        assert cache.is_dir()
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

        @jax.jit
        def f(a):
            return (a * 2.0 + jnp.sin(a)).sum()

        float(f(jnp.arange(1024.0)))
        assert any(cache.iterdir()), "no cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_size)
