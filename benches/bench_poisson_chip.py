"""On-chip statistical validation of the in-kernel Poisson bootstrap PRNG.

The Poisson bootstrap kernel (ops/moments_pallas.py:
resample_central_comoments_poisson) draws its frequency table from the
Pallas TPU PRNG inside the kernel, so its distributional correctness can
only be checked on real hardware (interpret mode exercises different PRNG
lowering).  This bench runs the kernel on the chip and gates:

1. **Centering**: replicate means center on the sample mean to within
   5 sigma of the expected Monte-Carlo error sigma/sqrt(R*nrep).
2. **Bootstrap SEM calibration**: the replicate standard deviation of the
   mean matches the exact standard error sigma_hat/sqrt(R) within 15%
   (chi-square bound at nrep=1024 is ~ +/-7% at 3 sigma; 15% leaves head
   room for the Poisson-vs-multinomial variance difference, which is
   O(1/R) here).
3. **Variance-statistic calibration**: same for the replicate scatter of
   du2 against its asymptotic sampling SD sqrt((du4 - du2^2)/R).
4. **Seed decorrelation**: replicate streams from adjacent user seeds are
   uncorrelated (|corr| < 5/sqrt(nrep)); this pins the ADVICE round-1 fix
   that moved the block id into a second seed word.
5. **Agreement with the table-based bootstrap**: SEM from the Poisson
   kernel matches the freq-matmul (multinomial) bootstrap within 15%.

Writes POISSON_CHIP.json and exits non-zero on any gate failure.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np


def main() -> None:
    from thermoextrap_tpu.ops.moments_pallas import (
        resample_central_comoments_fused,
        resample_central_comoments_poisson,
    )
    from thermoextrap_tpu.ops.resample import freq_from_indices, random_indices

    r, nrep, order = 4_000_000, 1024, 4
    k1, k2, k3 = jax.random.split(jax.random.key(7), 3)
    uv = 5.0 + jax.random.normal(k1, (r,), dtype=jax.numpy.float32)
    xv = (2.0 + 0.3 * (uv - 5.0) + 0.5 * jax.random.normal(k2, (r,))).astype(
        jax.numpy.float32
    )[:, None]

    out = {"metric": "poisson_bootstrap_chip_stats", "R": r, "nrep": nrep}
    checks: list[tuple[str, bool, float]] = []

    def gate(name, ok, value):
        checks.append((name, bool(ok), float(value)))
        out[name] = {"value": round(float(value), 6), "ok": bool(ok)}

    # exact sample statistics in f64 on host
    u64 = np.asarray(uv, np.float64)
    x64 = np.asarray(xv, np.float64)[:, 0]
    xbar, ubar = x64.mean(), u64.mean()
    sx, su = x64.std(), u64.std()
    dx = x64 - xbar
    duu = u64 - ubar
    du2, du4 = (duu**2).mean(), (duu**4).mean()

    xave_p, uave_p, du_p, _ = resample_central_comoments_poisson(
        uv, xv, nrep, order, seed=11
    )
    xave_p = np.asarray(xave_p, np.float64)[:, 0]
    uave_p = np.asarray(uave_p, np.float64)
    du2_p = np.asarray(du_p, np.float64)[2]

    # 1. centering
    mc_se_x = sx / np.sqrt(r) / np.sqrt(nrep)
    gate("centering_x_sigmas", abs(xave_p.mean() - xbar) < 5 * mc_se_x,
         (xave_p.mean() - xbar) / mc_se_x)
    mc_se_u = su / np.sqrt(r) / np.sqrt(nrep)
    gate("centering_u_sigmas", abs(uave_p.mean() - ubar) < 5 * mc_se_u,
         (uave_p.mean() - ubar) / mc_se_u)

    # 2. SEM calibration
    ratio_x = xave_p.std() / (sx / np.sqrt(r))
    gate("sem_ratio_x", 0.85 < ratio_x < 1.15, ratio_x)
    ratio_u = uave_p.std() / (su / np.sqrt(r))
    gate("sem_ratio_u", 0.85 < ratio_u < 1.15, ratio_u)

    # 3. du2 scatter vs asymptotic sampling SD
    sd_du2 = np.sqrt((du4 - du2**2) / r)
    ratio_v = du2_p.std() / sd_du2
    gate("var_stat_ratio_du2", 0.85 < ratio_v < 1.15, ratio_v)
    gate("centering_du2_sigmas",
         abs(du2_p.mean() - du2) < 5 * sd_du2 / np.sqrt(nrep),
         (du2_p.mean() - du2) / (sd_du2 / np.sqrt(nrep)))

    # 4. adjacent-seed decorrelation
    xave_q, *_ = resample_central_comoments_poisson(uv, xv, nrep, order, seed=12)
    xave_q = np.asarray(xave_q, np.float64)[:, 0]
    corr = np.corrcoef(xave_p, xave_q)[0, 1]
    gate("adjacent_seed_corr", abs(corr) < 5 / np.sqrt(nrep), corr)

    # 5. agreement with the multinomial (freq-table) bootstrap — smaller
    # config: the (nrep, R) table must fit in HBM (1024 x 4e6 f32 would be
    # 16 GB), so compare both kernels at (R=1e6, nrep=256)
    r5, nrep5 = 1_000_000, 256
    u5, x5 = uv[:r5], xv[:r5]
    freq = freq_from_indices(random_indices(k3, nrep5, r5), r5)
    xave_m, *_ = resample_central_comoments_fused(u5, x5, freq, order)
    xave_m = np.asarray(xave_m, np.float64)[:, 0]
    xave_p5, *_ = resample_central_comoments_poisson(u5, x5, nrep5, order, seed=21)
    xave_p5 = np.asarray(xave_p5, np.float64)[:, 0]
    ratio_pm = xave_p5.std() / xave_m.std()
    gate("poisson_vs_multinomial_sem", 0.8 < ratio_pm < 1.25, ratio_pm)

    # 6. batch-grouped grid kernel (round 4): nbatch=1 must match the
    # flat kernel's u-moments (identical (i, j)-keyed freq tiles), and
    # the multi-group + batch-pad paths (group_rows=2 over nbatch=5)
    # must be gb-invariant up to f32 dot association
    from thermoextrap_tpu.ops.moments_pallas import (
        resample_central_umoments_batched_poisson,
    )

    r6, nrep6 = 1_000_000, 256
    u6 = uv[:r6]
    _xa6, uave_f6, du_f6, _ = resample_central_comoments_poisson(
        u6, xv[:r6], nrep6, order, seed=31
    )
    uave_b6, du_b6 = resample_central_umoments_batched_poisson(
        u6[None], nrep6, order, seed=31
    )
    err_flat = float(
        np.max(np.abs(np.asarray(uave_b6)[:, 0] - np.asarray(uave_f6)))
    ) + float(
        np.max(
            np.abs(np.asarray(du_b6)[2:, :, 0] - np.asarray(du_f6)[2:])
        )
    )
    gate("grouped_vs_flat_maxabs", err_flat < 1e-4, err_flat)

    u5rows = jax.numpy.broadcast_to(u6, (5, r6))
    ua_d, du_d = resample_central_umoments_batched_poisson(
        u5rows, nrep6, order, seed=33
    )
    ua_g, du_g = resample_central_umoments_batched_poisson(
        u5rows, nrep6, order, seed=33, group_rows=2
    )
    err_gb = float(np.max(np.abs(np.asarray(ua_g) - np.asarray(ua_d)))) + float(
        np.max(np.abs(np.asarray(du_g)[2:] - np.asarray(du_d)[2:]))
    )
    gate("grouped_gb_invariance_maxabs", err_gb < 1e-4, err_gb)
    cross = float(
        np.max(np.abs(np.asarray(ua_g) - np.asarray(ua_g)[:, :1]))
    )
    gate("grouped_cross_batch_shared_freq", cross == 0.0, cross)

    out["ok"] = all(ok for _, ok, _ in checks)
    Path(__file__).parent.parent.joinpath("POISSON_CHIP.json").write_text(
        json.dumps(out) + "\n"
    )
    print(json.dumps(out))
    if not out["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
