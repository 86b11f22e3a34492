"""Multistate reweighting (MBAR) of the 1D ideal gas.

Mirrors the reference's MBARModel usage (models.py:1049-1111, which wraps
pymbar): pool samples drawn at several temperatures, solve the MBAR
free-energy equations once with the native Newton/self-consistent hybrid,
then evaluate <x> on a dense grid of target temperatures in ONE batched
program — and compare against polynomial interpolation and the analytic
ideal-gas average.

Run: python examples/mbar_reweighting.py   (CPU or TPU; --smoke shrinks)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _smoke import setup as _smoke_setup

SMOKE = _smoke_setup()

import numpy as np

import thermoextrap_tpu as xtpu
from thermoextrap_tpu import beta, idealgas
from thermoextrap_tpu.models.extrap import InterpModel, MBARModel
from thermoextrap_tpu.models.mbar import mbar_solve_info


def main() -> None:
    betas_sampled = [0.5, 1.0, 2.0, 4.0]
    betas_eval = np.linspace(0.5, 4.0, 8)
    shape = (2_000, 50) if SMOKE else (100_000, 500)

    states = []
    for i, b in enumerate(betas_sampled):
        x, u = idealgas.generate_data(shape, b, rng=i)
        data = xtpu.factory_data_values(
            uv=np.asarray(u), xv=np.asarray(x), order=2, central=True
        )
        states.append(beta.factory_extrapmodel(b, data))

    mbar = MBARModel(states)
    interp = InterpModel(states)

    # solver diagnostics: the hybrid takes a handful of Newton steps where
    # the plain fixed point crawls
    uv = np.stack([np.asarray(m.data.uv) for m in states])
    u_kn = np.asarray(betas_sampled)[:, None] * uv.reshape(1, -1)
    n_k = np.full(len(states), float(uv.shape[-1]))
    _, it_h, res_h = mbar_solve_info(u_kn, n_k, method="hybrid")
    print(
        f"MBAR hybrid solve: {int(it_h)} iters, residual {float(res_h):.1e}"
    )
    import jax

    if SMOKE or jax.default_backend() == "cpu":
        # the fixed-point comparison is a separate fresh compile — cheap on
        # CPU, 1-5 min through the remote TPU compile service; smoke-only
        _, it_s, res_s = mbar_solve_info(u_kn, n_k, method="sci")
        print(
            f"  vs plain fixed point: {int(it_s)} iters,"
            f" residual {float(res_s):.1e}"
        )

    # free energies of the sampled states with asymptotic uncertainties
    # (pymbar capability the reference discards)
    from thermoextrap_tpu.models.mbar import (
        mbar_covariance,
        mbar_fe_uncertainties,
        mbar_solve,
    )

    f_k = mbar_solve(u_kn, n_k)
    dfe = mbar_fe_uncertainties(mbar_covariance(u_kn, n_k, f_k))
    print("state free energies f_k - f_0 (+/- asymptotic):")
    for b, f, d in zip(betas_sampled, np.asarray(f_k), dfe[0]):
        print(f"  beta={b:4.1f}  f={f:10.4f} +/- {d:.1e}")

    mb = np.asarray(mbar.predict(betas_eval)).ravel()
    _, std = mbar.predict_ci(betas_eval, nrep=8 if SMOKE else 64)
    std = np.asarray(std).ravel()
    print(f"\n{'beta':>6} {'mbar':>12} {'+/-':>9} {'interp':>12} {'exact':>12}")
    for b, m, s in zip(betas_eval, mb, std):
        pint = float(np.asarray(interp.predict(b)))
        exact = float(idealgas.x_ave(b))
        print(f"{b:6.2f} {m:12.6f} {s:9.1e} {pint:12.6f} {exact:12.6f}")

    err = np.max(np.abs(mb - [idealgas.x_ave(b) for b in betas_eval]))
    print(f"\nmax |mbar - exact| = {err:.2e}")
    tol = 5e-2 if SMOKE else 5e-3
    assert err < tol, f"MBAR reweighting off by {err:.2e} (tol {tol})"


if __name__ == "__main__":
    main()
