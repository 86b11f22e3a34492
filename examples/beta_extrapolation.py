"""Temperature extrapolation / interpolation of the 1D ideal gas.

Mirrors the reference example notebook
examples/usage/basic/temperature_extrap.ipynb: generate samples at reference
state points, build order-6 extrapolation models with bootstrap uncertainty,
and a joint polynomial interpolation between two states.

Run: python examples/beta_extrapolation.py   (CPU or TPU)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _smoke import setup as _smoke_setup

SMOKE = _smoke_setup()

import numpy as np

import thermoextrap_tpu as xtpu
from thermoextrap_tpu import beta, idealgas
from thermoextrap_tpu.models.extrap import InterpModel


def main() -> None:
    order = 6
    beta0, beta1 = 1.0, 5.0
    betas_eval = np.linspace(beta0, beta1, 9)
    shape = (2_000, 100) if SMOKE else (50_000, 1_000)

    states = []
    for i, b in enumerate([beta0, beta1]):
        x, u = idealgas.generate_data(shape, b, rng=i)
        data = xtpu.factory_data_values(
            uv=np.asarray(u), xv=np.asarray(x), order=order, central=True
        )
        states.append(beta.factory_extrapmodel(b, data))

    print(f"{'beta':>6} {'extrap(b0)':>12} {'+/-':>9} {'interp':>12} {'exact':>12}")
    interp = InterpModel(states)
    boot0 = states[0].resample({"nrep": 20 if SMOKE else 100})
    for b in betas_eval:
        pred0 = float(np.asarray(states[0].predict(b)))
        err0 = float(np.asarray(boot0.predict(b)).std())
        pint = float(np.asarray(interp.predict(b)))
        exact = float(idealgas.x_ave(b))
        print(f"{b:6.2f} {pred0:12.6f} {err0:9.1e} {pint:12.6f} {exact:12.6f}")


if __name__ == "__main__":
    main()
