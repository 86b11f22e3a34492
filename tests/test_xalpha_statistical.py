"""Statistical tests for beta-dependent observables (reference
test_beta.py:622-969 role): observable ``beta * x`` with explicit
derivative data, raw+central, plus minus-log variants, vs the analytic
ideal gas."""

import numpy as np
import pytest

import thermoextrap_tpu as xtpu
from thermoextrap_tpu import beta as beta_xpan
from thermoextrap_tpu import idealgas

BETA0 = 5.6
ORDER = 4
NSAMP, NPART = 50_000, 1_000


@pytest.fixture(scope="module", params=[False, True], ids=["raw", "central"])
def model(request):
    central = request.param
    x, u = idealgas.generate_data((NSAMP, NPART), BETA0, rng=9)
    x = np.asarray(x)
    u = np.asarray(u)
    # observable beta * x: x^(0) = beta0*x, x^(1) = x, x^(d>=2) = 0
    deriv_vals = np.zeros((NSAMP, ORDER + 1, 1))
    deriv_vals[:, 0, 0] = BETA0 * x
    deriv_vals[:, 1, 0] = x
    data = xtpu.factory_data_values(
        uv=u, xv=deriv_vals, order=ORDER, central=central, xalpha=True
    )
    return beta_xpan.factory_extrapmodel(BETA0, data)


def test_derivs_match_analytic(model):
    derivs = np.asarray(model.derivs())[:, 0]
    boot = np.asarray(model.resample({"nrep": 80}).derivs())[:, :, 0]
    std = boot.std(axis=1)
    exact = np.array(
        [float(idealgas.dbeta_xave_depend(k)(BETA0, 1.0)) for k in range(ORDER + 1)]
    )
    assert np.all(np.abs(derivs - exact) < 5 * std + 1e-10)


def test_extrapolation_matches_analytic(model):
    b = BETA0 + 0.3
    pred = float(np.asarray(model.predict(b))[0])
    exact = float(idealgas.x_beta_extrap_depend(ORDER, BETA0, b, 1.0)[0])
    std = float(np.asarray(model.resample({"nrep": 80}).predict(b)).std())
    assert abs(pred - exact) < 5 * std + 1e-10


def test_minus_log_xalpha(model):
    b = BETA0 - 0.3
    pred = float(np.asarray(model.predict(b, minus_log=True))[0])
    exact = float(
        idealgas.x_beta_extrap_depend_minuslog(ORDER, BETA0, b, 1.0)[0]
    )
    std = float(
        np.asarray(
            model.resample({"nrep": 80}).predict(b, minus_log=True)
        ).std()
    )
    assert abs(pred - exact) < 5 * std + 1e-9


def test_gpr_multioutput_input():
    """Two-output state feeds the GP staging with per-dim covariances
    (reference ig_active.multiOutput_extrap_IG usage)."""
    from thermoextrap_tpu.gpr_active import active_utils as au
    from thermoextrap_tpu.gpr_active.ig_active import multiOutput_extrap_IG

    state = multiOutput_extrap_IG(1.1, rng=2, nconfig=2000, npart=300)
    x, y, cov = au.input_GP_from_state(state, n_rep=25)
    assert y.shape == (4, 2)
    assert cov.shape == (2, 4, 4)

    gpr = au.create_GPR(
        [state, multiOutput_extrap_IG(1.8, rng=3, nconfig=2000, npart=300)]
    )
    mu, var = gpr.predict_f(np.array([[1.4, 0.0]]))
    assert np.asarray(mu).shape == (1, 2)
    assert np.all(np.asarray(var) > 0)


def test_gpr_param_checkpoint(tmp_path):
    from thermoextrap_tpu.gpr_active import active_utils as au
    from thermoextrap_tpu.gpr_active.ig_active import extrap_IG

    states = [
        extrap_IG(b, rng=i, nconfig=1000, npart=200) for i, b in enumerate([0.9, 1.7])
    ]
    gpr = au.create_GPR(states)
    path = tmp_path / "params.json"
    gpr.save_params(path)
    before = gpr.parameters()
    gpr.set_parameters({k: v * 2 for k, v in before.items()})
    gpr.load_params(path)
    for k, v in gpr.parameters().items():
        np.testing.assert_allclose(v, before[k], rtol=1e-12)
