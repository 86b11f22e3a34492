"""Data organization: the container/constructor matrix.

Mirrors the reference notebook examples/usage/basic/Data_Organization.ipynb:
how timeseries and pre-computed moments map onto the framework's data
objects, and that every route into a moment container agrees.

Layout convention (see thermoextrap_tpu/data.py module docstring):
``uv (*batch, rec)``, ``xv (*batch, rec, [deriv+1,] *val)``; moment arrays
keep the moment order on the LEADING axis (``du[0]=1, du[1]=0``,
``dxdu[0]=0`` — reference parity).  The cmomy TRAILING-moment-axes layout
used by the reference's ``from_data``/``cmom``/``rmom`` (reference
data.py:849-852, 1216-1283) is supported as a migration seam.

Run: python examples/data_organization.py   (CPU or TPU)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _smoke import setup as _smoke_setup

SMOKE = _smoke_setup()

import numpy as np

import thermoextrap_tpu as xtpu
from thermoextrap_tpu import idealgas
from thermoextrap_tpu.data import DataCentralMoments, DataValues


def main() -> None:
    order, beta0 = 4, 1.0
    shape = (1_000, 50) if SMOKE else (10_000, 200)
    x, u = idealgas.generate_data(shape, beta0, rng=0)
    u, x = np.asarray(u), np.asarray(x)

    # 1. value-backed container (keeps samples; resamplable)
    dv = DataValues.from_vals(x, u, order=order, central=True)

    # 2. moment-backed container from the same values (reduces immediately)
    dm = DataCentralMoments.from_vals(x, u, order=order)

    # 3. from pre-computed RAW moments  u[n] = <u^n>,  xu[n] = <x u^n>
    un = np.stack([np.mean(u**n) for n in range(order + 1)])
    xun = np.stack([np.mean(x * u**n) for n in range(order + 1)])
    d_raw = DataCentralMoments.from_raw(un, xun, central=True)

    # 4. from pre-computed CENTRAL moments
    du = np.stack([np.mean((u - u.mean()) ** n) for n in range(order + 1)])
    dxdu = np.stack(
        [np.mean((x - x.mean()) * (u - u.mean()) ** n) for n in range(order + 1)]
    )
    d_central = DataCentralMoments.from_ave_central(x.mean(), u.mean(), du, dxdu)

    # 5. migration seam: the cmomy trailing-moment-axes tensor round-trips
    d_cmom = DataCentralMoments.from_data(dm.cmom(), central=True)

    # every route feeds the SAME derivative-engine inputs
    for name, d in [
        ("values", dv),
        ("from_vals", dm),
        ("from_raw", d_raw),
        ("from_ave_central", d_central),
        ("from_data(cmom)", d_cmom),
    ]:
        xave, du_a, dxdu_a = (np.asarray(a) for a in d.derivs_args)
        print(
            f"{name:>18}: <x>={float(xave.reshape(-1)[0]):.6f} "
            f"<du^2>={float(du_a.reshape(du_a.shape[0], -1)[2, 0]):.6f} "
            f"<dx du>={float(dxdu_a.reshape(dxdu_a.shape[0], -1)[1, 0]):.6f}"
        )

    # 6. independent blocks: batched moments + exact pooled merge
    nblock = 4
    ub, xb = u.reshape(nblock, -1), x.reshape(nblock, -1)
    d_blocks = DataCentralMoments.from_vals(
        xb[..., None], ub, order=order
    )  # batch axis = block
    pooled = d_blocks.reduce(axis=0)
    print(
        f"{'block-reduce':>18}: <x>={float(np.asarray(pooled.xave).reshape(-1)[0]):.6f}"
        f"  (== from_vals: "
        f"{np.allclose(np.asarray(pooled.xave).reshape(-1)[0], x.mean(), rtol=1e-5)})"
    )

    # 7. streaming: accumulate chunks online, never retaining samples
    st = DataCentralMoments.zeros(order)
    for c in range(nblock):
        st = st.push_vals(xb[c], ub[c])
    print(
        f"{'streaming':>18}: <x>={float(np.asarray(st.xave)):.6f}"
        f"  (exact online pooling)"
    )

    # 8. bootstrap straight into a replicated container
    d_boot = DataCentralMoments.from_resample_vals(
        x, u, order=order, sampler={"nrep": 10 if SMOKE else 50}, rng=0
    )
    print(
        f"{'bootstrap':>18}: <x> std across replicates = "
        f"{float(np.asarray(d_boot.xave).std()):.2e}"
    )

    # 9. x_is_u: observable IS the energy (u-derivative chains) — pass xv=None
    d_u = DataCentralMoments.from_vals(None, u, order=order)
    print(f"{'x_is_u':>18}: <u>={float(np.asarray(d_u.uave)):.6f}")

    # 10. migrating labeled (xarray-style) arrays: axes are matched by dim
    # NAME, any order (the reference's dims contract); works with real
    # xarray.DataArrays or the dependency-free LabeledArray
    from thermoextrap_tpu.compat import LabeledArray, from_labeled

    d_lab = from_labeled(
        LabeledArray(u, ("rec",)),
        LabeledArray(x[:, None].T, ("val", "rec")),  # transposed on purpose
        order=order,
        central=True,
    )
    print(
        f"{'labeled dims':>18}: <x>={float(np.asarray(d_lab.xave)[0]):.6f} "
        f"(transposed (val, rec) input, fixed by name)"
    )


if __name__ == "__main__":
    main()
