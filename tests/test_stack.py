"""GPR data-staging tests (reference tests role for stack.py)."""

import numpy as np

from thermoextrap_tpu import stack
from thermoextrap_tpu.gpr_active import ig_active


def test_to_mean_var(rng_np):
    arr = rng_np.normal(size=(4, 30, 2))
    out = stack.to_mean_var(arr, axis=1)
    assert out.shape == (4, 2, 2)
    np.testing.assert_allclose(out[..., 0], arr.mean(axis=1))
    np.testing.assert_allclose(out[..., 1], arr.var(axis=1))


def test_stacked_derivatives_roundtrip(rng_np):
    alphas = [0.5, 1.5]
    derivs = [rng_np.normal(size=(3, 20, 1)) for _ in alphas]
    sd = stack.StackedDerivatives.from_derivs(alphas, derivs)
    x, ys = sd.array_data()
    assert x.shape == (6, 2)
    assert len(ys) == 1
    assert ys[0].shape == (6, 2)
    np.testing.assert_allclose(x[:3, 0], 0.5)
    np.testing.assert_allclose(x[:, 1], [0, 1, 2, 0, 1, 2])
    np.testing.assert_allclose(ys[0][:3, 0], derivs[0].mean(axis=1)[:, 0])
    # order filter
    x2, ys2 = sd.array_data(order=1)
    assert x2.shape == (4, 2)
    assert sd.order == 2


def test_gprdata_staging():
    states = [
        ig_active.extrap_IG(b, rng=i, nconfig=1000, npart=200)
        for i, b in enumerate([0.8, 1.6])
    ]
    gd = stack.GPRData(states, nrep=20)
    x, ys = gd.array_data()
    assert x.shape == (8, 2)  # 2 states x (order 3 + 1)
    X, Y, cov = gd.to_gpr_data()
    assert X.shape == (8, 2)
    assert Y.shape == (8, 1)
    assert cov.shape == (1, 8, 8)
    # block-diagonal: cross-state covariance must be zero
    np.testing.assert_allclose(cov[0][:4, 4:], 0.0)


def test_states_derivs_concat():
    states = [
        ig_active.extrap_IG(b, rng=i, nconfig=500, npart=100)
        for i, b in enumerate([0.9, 1.4])
    ]
    out = stack.states_derivs_concat(states)
    assert out.shape == (8, 1)


def test_stack_multidim_semantics(rng_np):
    """Generic named-axis stacking (reference stack_dataarray, stack.py:15-84)."""
    arr = rng_np.normal(size=(3, 4, 2, 5))
    dims = ("order", "cell", "comp", "stats")
    coords = {"order": np.arange(3), "cell": np.linspace(0.0, 1.0, 4)}

    out, xc, yc = stack.stack_multidim(
        arr, dims, x_dims=("order", "cell"), stats_dim="stats", coords=coords
    )
    assert out.shape == (12, 2, 5)
    assert xc.shape == (12, 2)
    assert yc.shape == (2, 1)
    # row k of the stack is arr[i, j] with k = i * 4 + j (C-order), and the
    # coordinate matrix tracks (order_i, cell_j) for that row
    for k in [0, 5, 11]:
        i, j = divmod(k, 4)
        np.testing.assert_allclose(out[k], arr[i, j])
        np.testing.assert_allclose(xc[k], [coords["order"][i], coords["cell"][j]])

    # default y_dims = all remaining axes; x_dims order controls the fastest axis
    out2, xc2, _ = stack.stack_multidim(arr, dims, x_dims=("cell", "order"), stats_dim="stats")
    np.testing.assert_allclose(out2[1], arr[1, 0])  # order fastest now
    np.testing.assert_allclose(xc2[1], [0, 1])

    # policy="raise" demands coordinates
    import pytest

    with pytest.raises(ValueError, match="not set"):
        stack.stack_multidim(arr, dims, x_dims="order", policy="raise")
    with pytest.raises(ValueError, match="partition"):
        stack.stack_multidim(arr, dims, x_dims="order", y_dims=("cell",))


def test_multidim_observable_gpr_staging(rng_np):
    """A (rec, 2, 3) observable must stage into a 6-output GP: the val axes
    flatten into ystack output dims (reference stack.py:15-84 role)."""
    import thermoextrap_tpu as xtpu
    from thermoextrap_tpu import beta as beta_xpan
    from thermoextrap_tpu.gpr_active import active_utils as au

    def mk(b, seed):
        rng = np.random.default_rng(seed)
        u = rng.normal(2.0, 1.0, 600)
        x = np.stack([0.1 * k + 0.3 * u + rng.normal(size=600) for k in range(6)], axis=1)
        x = x.reshape(600, 2, 3)
        d = xtpu.factory_data_values(uv=u, xv=x, order=2, central=True)
        return beta_xpan.factory_extrapmodel(b, d)

    states = [mk(0.8, 0), mk(1.6, 1)]
    # staging helpers
    sd = stack.StackedDerivatives.from_states(states, nrep=15)
    x, ys = sd.array_data()
    assert x.shape == (6, 2)
    assert len(ys) == 6
    # full GP assembly + fit on the multi-output data
    gpr = au.create_GPR(states)
    assert gpr.Y.shape == (6, 6)
    mu, var = gpr.predict_f(np.array([[1.2, 0.0]]))
    assert np.asarray(mu).shape == (1, 6)
    assert np.all(np.isfinite(np.asarray(mu)))
