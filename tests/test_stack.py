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
