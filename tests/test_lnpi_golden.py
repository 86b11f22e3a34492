"""Golden-data lnPi regression (reference tests/test_lnPi.py:99-159).

The reference macrostate distribution + raw energy moments at T=0.73 must
extrapolate exactly (to float roundoff) onto the stored analytic
extrapolations at other temperatures.
"""

import json
from pathlib import Path

import numpy as np
import pytest

import thermoextrap_tpu as xtpu
from thermoextrap_tpu import beta as beta_xpan
from thermoextrap_tpu import lnpi as lnpi_xpan
from thermoextrap_tpu.utils.trees import replace

DATA = Path(__file__).parent / "lnpi_data" / "sample_data.json"


@pytest.fixture(scope="module")
def golden():
    with DATA.open() as f:
        d = json.load(f)

    def prep(x):
        lnpi = np.array(x["lnPi"])
        lnpi = lnpi - lnpi[0]
        energy = np.array(x["energy"])  # (n, umom 1..3)
        energy = np.concatenate(
            [np.ones_like(energy[:, :1]), energy], axis=-1
        )  # include umom=0
        return {
            "lnpi": lnpi,
            "energy": energy,
            "mu": x["mu"],
            "beta": x["beta"],
            "order": x["order"],
        }

    return prep(d["ref"]), [prep(s) for s in d["samples"]]


@pytest.fixture(params=[False, True], ids=["raw", "central"])
def central(request):
    return request.param


@pytest.fixture
def data_u(golden, central):
    ref, _ = golden
    # moment axis leading: (umom, n)
    return xtpu.DataCentralMoments.from_ave_raw(
        u=ref["energy"].T, xu=None, x_is_u=True, central=central
    )


def test_u_extrapolation(golden, data_u):
    ref, samples = golden
    model = beta_xpan.factory_extrapmodel(
        beta=ref["beta"], data=data_u, name="u_ave"
    )
    for s in samples:
        pred = np.asarray(
            model.predict(s["beta"], cumsum=True)
        )  # (order+1, n)
        if s["order"] <= model.order:
            np.testing.assert_allclose(
                pred[s["order"]], s["energy"][:, 1], rtol=1e-5
            )


def test_lnpi_extrapolation(golden, data_u):
    ref, samples = golden
    meta = lnpi_xpan.lnPiDataCallback.from_mu(
        lnPi0=ref["lnpi"],
        mu=[ref["mu"]],
        ncoords=np.arange(len(ref["lnpi"]), dtype=float)[None, :],
    )
    data = replace(data_u, meta=meta)
    model = lnpi_xpan.factory_extrapmodel_lnPi(beta=ref["beta"], data=data)
    for s in samples:
        pred = np.asarray(model.predict(s["beta"], cumsum=True))  # (order+2, n)
        got = pred[s["order"]] - pred[s["order"], 0]
        np.testing.assert_allclose(got, s["lnpi"], rtol=1e-7, atol=1e-10)
