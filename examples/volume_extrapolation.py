"""Volume (density) extrapolation of the 1D ideal gas.

Mirrors the reference volume workflow (examples around test_volume.py):
first-order volume expansion from virial data, general and IG-specialized
modules, with bootstrap uncertainty.

Run: python examples/volume_extrapolation.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _smoke import setup as _smoke_setup

SMOKE = _smoke_setup()

import numpy as np

from thermoextrap_tpu import idealgas, volume, volume_idealgas


def main() -> None:
    beta, vol0 = 1.0, 1.0
    shape = (3_000, 50) if SMOKE else (100_000, 200)
    pos = np.asarray(idealgas.x_sample(shape, beta, vol0, rng=0))
    x = pos.mean(axis=-1)  # observable: mean position
    # virial = -sum_i q_i dU/dq_i = -U for the linear field; uv = beta*virial
    w = -beta * pos.sum(axis=-1)

    m_gen = volume.factory_extrapmodel(vol0, uv=w, xv=x, dxdqv=x, ndim=1)
    m_ig = volume_idealgas.factory_extrapmodel(vol0, uv=w, xv=x)
    boot = m_gen.resample({"nrep": 20 if SMOKE else 100})

    vols = np.array([0.7, 0.85, 1.0, 1.15, 1.3])
    print(f"{'vol':>6} {'general':>10} {'IG-variant':>11} {'+/-':>9} {'exact(o1)':>10}")
    for v in vols:
        pg = float(np.asarray(m_gen.predict(v)))
        pi = float(np.asarray(m_ig.predict(v)))
        err = float(np.asarray(boot.predict(v)).std())
        exact = float(idealgas.x_vol_extrap(1, vol0, v, beta)[0])
        print(f"{v:6.2f} {pg:10.5f} {pi:11.5f} {err:9.1e} {exact:10.5f}")


if __name__ == "__main__":
    main()
