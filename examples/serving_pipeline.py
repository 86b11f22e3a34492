"""One-dispatch serving pipelines: extrapolation + CI, and lnPi grids.

The production shape of the extrapolation workflow: the whole chain
(fused Pallas moment reduction -> series derivative engine -> Taylor
evaluation -> in-kernel Poisson bootstrap CI) compiled into a SINGLE
jitted program, so a serving call costs one device dispatch.

Run: python examples/serving_pipeline.py          (real TPU, R=1e8)
     python examples/serving_pipeline.py --smoke  (CPU, small sizes)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _smoke import setup as _smoke_setup

SMOKE = _smoke_setup()

import jax
import jax.numpy as jnp
import numpy as np

from thermoextrap_tpu import idealgas
from thermoextrap_tpu.pipeline import make_extrap_pipeline, make_lnpi_pipeline


def main() -> None:
    beta0, order = 2.0, 4
    nconfig, npart = (2_000, 100) if SMOKE else (100_000, 1_000)
    nrep = 32 if SMOKE else 128

    # ideal-gas samples at beta0; predictions vs the analytic answer
    x, u = idealgas.generate_data((nconfig, npart), beta0, rng=0)
    x = jnp.asarray(x)
    u = jnp.asarray(u)
    betas = jnp.asarray([1.6, 1.8, 2.0, 2.2, 2.4], x.dtype)

    run = make_extrap_pipeline(order, beta0, nrep=nrep)
    pred, std = run(u, x, betas, seed=0)  # compile
    float(pred[0])
    t0 = time.perf_counter()
    pred, std = run(u, x, betas, seed=1)
    float(pred[0])
    dt = time.perf_counter() - t0

    exact = np.array([idealgas.x_ave(float(b)) for b in betas])
    # generate_data returns per-configuration aggregates: the reduction
    # runs over nconfig records (each summarizing npart particles)
    print(f"one-dispatch extrap+CI ({u.shape[0]:.0e} config records, "
          f"{nrep} bootstrap reps): {dt * 1e3:.1f} ms")
    for b, p, s, e in zip(np.asarray(betas), np.asarray(pred),
                          np.asarray(std), exact):
        print(f"  beta={b:.1f}: pred={p:.6f} +/- {s:.1e}  analytic={e:.6f}")
    err = np.abs(np.asarray(pred) - exact)
    assert err[2] < 1e-3, "beta0 prediction must match the sample mean"

    # bf16 sample streams: half the HBM traffic per serving call (only
    # engages on an accelerator; accuracy gated in ACCURACY_1e8.json)
    run16 = make_extrap_pipeline(order, beta0, nrep=nrep, bf16=True)
    p16, _s16 = run16(u, x, betas, seed=0)
    float(p16[0])
    t0 = time.perf_counter()
    p16, _s16 = run16(u, x, betas, seed=1)
    float(p16[0])
    dt16 = time.perf_counter() - t0
    print(f"  bf16 streams: {dt16 * 1e3:.1f} ms; max |bf16 - f32| = "
          f"{np.max(np.abs(np.asarray(p16) - np.asarray(pred))):.1e}")
    assert np.max(np.abs(np.asarray(p16) - np.asarray(pred))) < 5e-2

    # lnPi macrostate grid in one dispatch
    n_grid, r = (16, 5_000) if SMOKE else (512, 1_000_000)
    kg = jax.random.key(7)
    shift = jnp.linspace(-2.0, 2.0, n_grid)
    uvg = shift[:, None] + (
        -10.0 + 1.5 * jax.random.normal(kg, (n_grid, r), dtype=jnp.float32)
    )
    lnpi0 = jnp.linspace(0.0, 5.0, n_grid)
    mudotn = 0.7 * jnp.arange(n_grid, dtype=jnp.float32)

    run_lnpi = make_lnpi_pipeline(3, 1.4)
    out = run_lnpi(uvg, lnpi0, mudotn, jnp.asarray([1.2, 1.4, 1.6]))
    float(out[0, 0])
    t0 = time.perf_counter()
    out = run_lnpi(uvg, lnpi0, mudotn, jnp.asarray([1.2, 1.4, 1.6]))
    float(out[0, 0])
    dt = time.perf_counter() - t0
    np.testing.assert_allclose(
        np.asarray(out)[1], np.asarray(lnpi0), rtol=1e-4, atol=1e-4
    )
    print(f"one-dispatch lnPi grid ({n_grid} macrostates x {r:.0e} samples): "
          f"{dt * 1e3:.1f} ms")

    # ... with a bootstrap CI over the whole grid (shared-frequency
    # replicates: on accelerator the batched in-kernel Poisson bootstrap,
    # zero HBM for the table)
    nrep_g = 16 if SMOKE else 64
    run_lnpi_ci = make_lnpi_pipeline(3, 1.4, nrep=nrep_g)
    gp, gs = run_lnpi_ci(uvg, lnpi0, mudotn, jnp.asarray([1.2, 1.6]), seed=2)
    float(gp[0, 0])
    t0 = time.perf_counter()
    gp, gs = run_lnpi_ci(uvg, lnpi0, mudotn, jnp.asarray([1.2, 1.6]), seed=3)
    float(gp[0, 0])
    dt = time.perf_counter() - t0
    gs = np.asarray(gs)
    assert gs.shape == (2, n_grid) and np.all(gs >= 0)
    print(f"  + grid bootstrap CI ({nrep_g} reps): {dt * 1e3:.1f} ms; "
          f"median std {np.median(gs):.2e}")

    # --- volume ensemble: one packed order-1 reduction serves
    # d<x>/dV = (cov(x, W) + <dxdq>) / (V d) with a bootstrap CI
    from thermoextrap_tpu import volume
    from thermoextrap_tpu.pipeline import make_volume_pipeline

    rv = 20_000 if SMOKE else 10_000_000
    v0, nd = 2.0, 3
    rng = np.random.default_rng(4)
    wv = jnp.asarray(rng.normal(1.0, 0.4, rv), jnp.float32)
    xvv = 0.5 + 0.3 * wv + jnp.asarray(rng.normal(0, 0.2, rv), jnp.float32)
    dxdqv = 0.1 * xvv + jnp.asarray(rng.normal(0, 0.05, rv), jnp.float32)
    vols = jnp.asarray([1.8, 2.0, 2.3], jnp.float32)

    run_vol = make_volume_pipeline(v0, ndim=nd, nrep=nrep)
    vp, vs = run_vol(wv, xvv, dxdqv, vols, seed=5)
    float(vp[0])
    t0 = time.perf_counter()
    vp, vs = run_vol(wv, xvv, dxdqv, vols, seed=6)
    float(vp[0])
    dt = time.perf_counter() - t0
    model = volume.factory_extrapmodel(
        v0, np.asarray(wv), np.asarray(xvv), np.asarray(dxdqv), ndim=nd
    )
    np.testing.assert_allclose(
        np.asarray(vp), np.asarray(model.predict(vols)).ravel(), rtol=5e-3
    )
    assert np.all(np.asarray(vs) > 0)
    print(f"one-dispatch volume extrap + CI ({rv:.0e} samples, {nrep} reps): "
          f"{dt * 1e3:.1f} ms")

    # --- perturbation reweighting: the zero-derivative serving path
    # (reference PerturbModel) — logsumexp-stabilized (A, R) reweight +
    # freq-matmul Poisson CI, checked against the analytic ideal gas
    from thermoextrap_tpu.pipeline import make_perturb_pipeline

    pbetas = jnp.asarray([1.9, 2.0, 2.1], x.dtype)
    run_pert = make_perturb_pipeline(beta0, nrep=nrep)
    ppred, pstd = run_pert(u, x, pbetas, seed=7)
    float(ppred[0])
    t0 = time.perf_counter()
    ppred, pstd = run_pert(u, x, pbetas, seed=8)
    float(ppred[0])
    dt = time.perf_counter() - t0
    pexact = np.array([idealgas.x_ave(float(b)) for b in pbetas])
    print(f"one-dispatch perturb reweight + CI ({u.shape[0]:.0e} records, "
          f"{nrep} reps): {dt * 1e3:.1f} ms")
    for b, p, s, e in zip(np.asarray(pbetas), np.asarray(ppred),
                          np.asarray(pstd), pexact):
        print(f"  beta={b:.2f}: pred={p:.6f} +/- {s:.1e}  analytic={e:.6f}")
    # at beta0 reweighting is the plain sample mean; nearby targets must
    # stay within a few bootstrap sigma of the analytic curve
    assert abs(np.asarray(ppred)[1] - pexact[1]) < 1e-3
    assert np.all(np.asarray(pstd) > 0)


if __name__ == "__main__":
    main()
