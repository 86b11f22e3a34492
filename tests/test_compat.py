"""Labeled-array migration adapter (compat.py): dims-by-name == positional."""

import numpy as np
import pytest

from thermoextrap_tpu import beta, factory_data_values
from thermoextrap_tpu.compat import LabeledArray, from_labeled, predict_labeled


def test_any_axis_order_matches_positional(rng_np):
    uv = rng_np.normal(3.0, 1.0, 400)
    xv = rng_np.normal(1.0, 0.5, (400, 3))
    want = factory_data_values(uv=uv, xv=xv, order=4, central=True)

    # xv arrives transposed (val, rec) — the adapter must fix it by name
    got = from_labeled(
        LabeledArray(uv, ("rec",)),
        LabeledArray(xv.T, ("val", "rec")),
        order=4,
        central=True,
    )
    np.testing.assert_allclose(np.asarray(got.dxdu), np.asarray(want.dxdu), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(got.xave), np.asarray(want.xave), rtol=1e-13)


def test_deriv_dim_sets_xalpha(rng_np):
    uv = rng_np.normal(3.0, 1.0, 200)
    xv = rng_np.normal(1.0, 0.5, (200, 3, 2))  # (rec, deriv, val)
    want = factory_data_values(uv=uv, xv=xv, order=2, central=True, xalpha=True)
    got = from_labeled(
        LabeledArray(uv, ("rec",)),
        LabeledArray(np.transpose(xv, (2, 1, 0)), ("val", "deriv", "rec")),
        order=2,
        central=True,
        deriv_dim="deriv",
    )
    assert got.xalpha
    np.testing.assert_allclose(np.asarray(got.dxdu), np.asarray(want.dxdu), rtol=1e-13)


def test_labeled_weight_and_validation(rng_np):
    uv = rng_np.normal(3.0, 1.0, 100)
    xv = rng_np.normal(1.0, 0.5, (100, 1))
    w = rng_np.uniform(0.5, 1.5, 100)
    want = factory_data_values(uv=uv, xv=xv, order=3, central=True, weight=w)
    got = from_labeled(
        LabeledArray(uv, ("rec",)),
        LabeledArray(xv, ("rec", "val")),
        order=3,
        central=True,
        weight=LabeledArray(w, ("rec",)),
    )
    np.testing.assert_allclose(np.asarray(got.du), np.asarray(want.du), rtol=1e-13)

    with pytest.raises(ValueError, match="rec"):
        from_labeled(LabeledArray(uv, ("time",)), LabeledArray(xv, ("rec", "val")), 2)
    with pytest.raises(TypeError, match="labeled"):
        from_labeled(uv, LabeledArray(xv, ("rec", "val")), 2)
    with pytest.raises(ValueError, match="dims"):
        LabeledArray(xv, ("rec",))


def test_predict_labeled_end_to_end(rng_np):
    from thermoextrap_tpu import idealgas

    x, u = idealgas.generate_data((5000, 1), 2.0, rng=rng_np.integers(2**31))
    data = from_labeled(
        LabeledArray(np.asarray(u), ("rec",)),
        LabeledArray(np.asarray(x)[:, None], ("rec", "val")),
        order=2,
        central=True,
    )
    model = beta.factory_extrapmodel(2.0, data)
    out = predict_labeled(model, [1.9, 2.0, 2.1], val_dims=("val",))
    assert out.dims == ("beta", "val")
    assert np.asarray(out).shape == (3, 1)
    # at beta0 the prediction is the sample mean
    np.testing.assert_allclose(
        np.asarray(out)[1, 0], np.mean(np.asarray(x)), rtol=1e-10
    )
    with pytest.raises(ValueError, match="val_dims"):
        predict_labeled(model, [2.0], val_dims=())
