"""Volume extrapolation vs the analytic 1D ideal gas
(reference tests/test_volume.py role)."""

import numpy as np
import pytest

from thermoextrap_tpu import idealgas, volume, volume_idealgas

BETA = 1.0
VOL0 = 1.0
NSAMP = 200_000
NPART = 100


@pytest.fixture(scope="module")
def ig_volume_data():
    pos = np.asarray(idealgas.x_sample((NSAMP, NPART), BETA, VOL0, rng=12))
    x = pos.mean(axis=-1)  # observable: mean position
    # virial = -sum_i q_i dU/dq_i = -U for the linear field; uv = beta * virial
    w = -BETA * pos.sum(axis=-1)
    return x, w


def test_ig_module_first_order(ig_volume_data):
    x, w = ig_volume_data
    model = volume_idealgas.factory_extrapmodel(VOL0, uv=w, xv=x)
    derivs = np.asarray(model.derivs())
    exact0 = float(idealgas.x_ave(BETA, VOL0))
    exact1 = float(idealgas.dvol_xave(1)(BETA, VOL0))
    assert abs(derivs[0] - exact0) < 5e-3
    assert abs(derivs[1] - exact1) < 5e-2

    vols = np.array([0.8, 1.2])
    pred = np.asarray(model.predict(vols))
    exact = np.array([idealgas.x_vol_extrap(1, VOL0, v, BETA)[0] for v in vols])
    np.testing.assert_allclose(pred, exact, atol=5e-2)


def test_general_volume_matches_ig_variant(ig_volume_data):
    """volume.factory_extrapmodel with dxdqv = x (IG: sum dx/dq_i q_i = x)
    and ndim=1 must equal the IG-specialized module exactly."""
    x, w = ig_volume_data
    m_gen = volume.factory_extrapmodel(
        VOL0, uv=w, xv=x, dxdqv=x, ndim=1
    )
    m_ig = volume_idealgas.factory_extrapmodel(VOL0, uv=w, xv=x)
    np.testing.assert_allclose(
        np.asarray(m_gen.derivs()), np.asarray(m_ig.derivs()), rtol=1e-12
    )


def test_volume_resample(ig_volume_data):
    x, w = ig_volume_data
    model = volume.factory_extrapmodel(VOL0, uv=w[:5000], xv=x[:5000], dxdqv=x[:5000], ndim=1)
    mr = model.resample({"nrep": 8})
    pred = np.asarray(mr.predict(1.1))
    assert pred.shape == (8,)
    exact = float(idealgas.x_vol_extrap(1, VOL0, 1.1, BETA)[0])
    assert abs(pred.mean() - exact) < 10 * pred.std() + 5e-2


def test_ig_factory_extrapmodel_data(ig_volume_data):
    """factory_extrapmodel_data == factory_extrapmodel on the same samples
    (reference volume_idealgas.py:121-161); validators reject central data."""
    import thermoextrap_tpu as xtpu

    x, w = ig_volume_data
    data = xtpu.factory_data_values(
        uv=w, xv=x, order=1, central=False, xalpha=False
    )
    m_data = volume_idealgas.factory_extrapmodel_data(VOL0, data)
    m_vals = volume_idealgas.factory_extrapmodel(VOL0, uv=w, xv=x)
    np.testing.assert_allclose(
        np.asarray(m_data.predict([0.9, 1.1])),
        np.asarray(m_vals.predict([0.9, 1.1])),
        rtol=1e-12,
    )

    central = xtpu.factory_data_values(uv=w, xv=x, order=1, central=True)
    with pytest.raises(ValueError, match="raw moments"):
        volume_idealgas.factory_extrapmodel_data(VOL0, central)
