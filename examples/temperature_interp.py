"""Temperature interpolation: the full model family side by side.

Mirrors the reference notebook examples/usage/basic/Temperature_Interp.ipynb
(and the reweighting parts of Temperature_Extrap_Case1): from samples at a
few reference inverse temperatures, predict <x>(beta) across the whole
bracket with every interpolation/reweighting model the framework provides —

- ``ExtrapWeightedModel``  — Minkowski-weighted blend of bracketing
  extrapolations (reference models.py:760-850),
- ``InterpModel``          — one joint polynomial through all states
  (reference models.py:853-932),
- ``InterpModelPiecewise`` — pairwise joint polynomials, bracketing pair
  per evaluation point (reference models.py:935-1006),
- ``MBARModel``            — multistate reweighting, solved natively in jax
  (reference models.py:1049-1111),
- ``PerturbModel``         — single-state exponential reweighting
  (reference models.py:1009-1046),

all compared against the analytic ideal-gas result.

At full size (1000-particle extensive energies) the reweighting models
(MBAR between sampled states, single-state perturbation) visibly degrade
away from the reference β's — configurational overlap vanishes as
exp(-Δβ·U) concentrates on a handful of samples — while the
derivative-based interpolations stay accurate.  That contrast is the
motivation for derivative extrapolation in the reference's papers (and
its Temperature_Interp notebook shows the same).

Run: python examples/temperature_interp.py   (CPU or TPU)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _smoke import setup as _smoke_setup

SMOKE = _smoke_setup()

import numpy as np

import thermoextrap_tpu as xtpu
from thermoextrap_tpu import beta, idealgas


def main() -> None:
    order = 4
    betas_ref = [1.0, 3.0, 5.0]
    betas_eval = np.linspace(1.0, 5.0, 9)
    shape = (2_000, 100) if SMOKE else (50_000, 1_000)

    states, raw = [], {}
    for i, b in enumerate(betas_ref):
        x, u = idealgas.generate_data(shape, b, rng=i)
        raw[b] = (np.asarray(u), np.asarray(x))
        data = xtpu.factory_data_values(
            uv=raw[b][0], xv=raw[b][1], order=order, central=True
        )
        states.append(beta.factory_extrapmodel(b, data))

    weighted = xtpu.ExtrapWeightedModel(states)
    interp = xtpu.InterpModel(states)
    piecewise = xtpu.InterpModelPiecewise(states)
    mbar = xtpu.MBARModel(states)
    perturb = beta.factory_perturbmodel(betas_ref[0], *raw[betas_ref[0]])

    cols = ["weighted", "interp", "piecewise", "mbar", "perturb(b0)", "exact"]
    print(f"{'beta':>6} " + " ".join(f"{c:>12}" for c in cols))
    for b in betas_eval:
        vals = [
            float(np.asarray(weighted.predict(b))),
            float(np.asarray(interp.predict(b))),
            float(np.asarray(piecewise.predict(b))),
            float(np.asarray(mbar.predict(b))),
            float(np.asarray(perturb.predict(b))),
            float(idealgas.x_ave(b)),
        ]
        print(f"{b:6.2f} " + " ".join(f"{v:12.6f}" for v in vals))

    # bootstrap uncertainty works on the collections too (resample passes
    # through to every member state)
    boot = weighted.resample({"nrep": 10 if SMOKE else 50})
    mid = 0.5 * (betas_ref[0] + betas_ref[-1])
    ci = float(np.asarray(boot.predict(mid)).std())
    print(f"\nweighted model at beta={mid:.2f}: +/- {ci:.2e} (bootstrap std)")


if __name__ == "__main__":
    main()
