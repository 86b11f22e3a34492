"""Macrostate-distribution (lnPi) temperature extrapolation.

Mirrors the reference example
examples/usage/basic/macrostate_dist_extrap.ipynb using the golden sample
data shipped with the tests: extrapolate lnPi from T=0.73 to other
temperatures and compare with the stored analytic extrapolations.

Run: python examples/macrostate_lnpi.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _smoke import setup as _smoke_setup

SMOKE = _smoke_setup()

import json
from pathlib import Path

import numpy as np

import thermoextrap_tpu as xtpu
from thermoextrap_tpu import lnpi
from thermoextrap_tpu.utils.trees import replace

DATA = Path(__file__).parent.parent / "tests" / "lnpi_data" / "sample_data.json"


def main() -> None:
    with DATA.open() as f:
        d = json.load(f)

    ref = d["ref"]
    lnpi0 = np.array(ref["lnPi"])
    lnpi0 -= lnpi0[0]
    energy = np.array(ref["energy"])  # (n_macrostate, umom 1..3)
    energy = np.concatenate([np.ones_like(energy[:, :1]), energy], axis=-1)

    data = xtpu.DataCentralMoments.from_ave_raw(
        u=energy.T, xu=None, x_is_u=True, central=True
    )
    meta = lnpi.lnPiDataCallback.from_mu(
        lnPi0=lnpi0,
        mu=[ref["mu"]],
        ncoords=np.arange(len(lnpi0), dtype=float)[None, :],
    )
    model = lnpi.factory_extrapmodel_lnPi(ref["beta"], replace(data, meta=meta))

    for s in d["samples"][: (2 if SMOKE else 4)]:
        pred = np.asarray(model.predict(s["beta"], cumsum=True))[s["order"]]
        pred = pred - pred[0]
        gold = np.array(s["lnPi"])
        gold -= gold[0]
        err = np.max(np.abs(pred - gold))
        print(
            f"T={s['temp']:.3f} order={s['order']}: max |lnPi error| = {err:.2e}"
        )


if __name__ == "__main__":
    main()
