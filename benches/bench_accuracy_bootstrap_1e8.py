"""On-chip accuracy gates for the BOOTSTRAP kernels at R = 1e8, order 6
(VERDICT r2 item 2: bf16 sample streams for both bootstrap kernels,
accuracy-gated like the fused reduce).

Self-contained (no f64 host pass — the fused reduce itself is gated
against f64 at this scale by bench_accuracy_1e8.py):

- **f32 statistical gate**: the Poisson-bootstrap replicate mean of each
  central moment matches the full-data fused reduction within
  ``5 * std(reps)/sqrt(nrep) + 5e-4 * scale`` (the bootstrap is unbiased
  to O(1/R); the additive term covers f32 single-pass accumulation).
- **bf16 quantization gate**: bf16 and f32 kernels run with the SAME seed
  → IDENTICAL in-kernel frequencies, so the per-replicate difference is
  pure input quantization + accumulation, gated by the delta-method bias
  bound ``5 * E[f^2] * [C(n,2) |du_{n-2}| E[q_u^2] (+cross term for
  dxdu)] + 2e-3 * sigma^n`` — the additive term covers the difference of
  the two kernels' independent f32 roundoff paths and stays below one
  sampling sigma of every gated estimator at this R; no sampling-noise
  slack is needed because the frequencies are identical.
- The freq-matmul kernel gets the same same-freq bf16-vs-f32 gate with a
  device-generated Poisson frequency table (nrep kept small: the table is
  ``nrep x 1e8`` int32 in HBM).

Writes ACCURACY_BOOTSTRAP_1E8.json and prints one JSON line.
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

R = 100_000_000
ORDER = 6
NREP_POISSON = 64
NREP_FREQ = 2
# f32 accumulation allowance on the sigma^n scale: the bf16-vs-f32 delta
# includes the DIFFERENCE of two independent f32 single-pass roundoff
# paths (each ~1e-4..1e-3 relative on high moments); 2e-3 sigma^n stays
# below one sampling sigma of every gated estimator at R=1e8
ACC_TOL = 2e-3


def gen(jnp, jrandom, r):
    k1, k2 = jrandom.split(jrandom.key(7))
    u = (5.0 + jrandom.normal(k1, (r,), dtype=jnp.float32)).astype(jnp.float32)
    n2 = jrandom.normal(k2, (r,), dtype=jnp.float32)
    x = (2.0 + 0.3 * (u - 5.0) + 0.5 * n2).astype(jnp.float32)
    return u, x


def main() -> None:
    import jax
    import jax.numpy as jnp
    import jax.random as jrandom
    import ml_dtypes
    import numpy as np

    from thermoextrap_tpu.ops.moments_pallas import (
        reduce_central_comoments_fused,
        resample_central_comoments_fused,
        resample_central_comoments_poisson,
    )

    # quantization second moments from a large same-distribution host draw
    rng = np.random.default_rng(7)
    us = rng.normal(5.0, 1.0, 2_000_000).astype(np.float32)
    xs = (2.0 + 0.3 * (us - 5.0) + rng.normal(0, 0.5, us.shape)).astype(
        np.float32
    )
    q2_u = float(
        np.mean(
            (
                np.float64(us)
                - np.float64(us.astype(ml_dtypes.bfloat16).astype(np.float32))
            )
            ** 2
        )
    )
    q2_x = float(
        np.mean(
            (
                np.float64(xs)
                - np.float64(xs.astype(ml_dtypes.bfloat16).astype(np.float32))
            )
            ** 2
        )
    )

    u, x = gen(jnp, jrandom, R)
    x2 = x[:, None]

    out = reduce_central_comoments_fused(u, x2, ORDER)
    du_full = np.asarray(out[2], np.float64)
    dx_full = np.asarray(out[3], np.float64).reshape(ORDER + 1)
    sigma_u = math.sqrt(du_full[2])

    report = {"metric": "bootstrap_accuracy_gate_1e8_order6"}
    ok = True

    def gate_pair(name, r32, r16, nrep):
        nonlocal ok
        _, _, du32, dx32 = r32
        _, _, du16, dx16 = r16
        dx32 = dx32.reshape(ORDER + 1, nrep)
        dx16 = dx16.reshape(ORDER + 1, nrep)
        for n in range(2, ORDER + 1):
            scale = sigma_u**n
            # f32 statistical gate (Poisson replicate mean vs full data)
            mean_err = abs(du32[n].mean() - du_full[n])
            stat_gate = 5.0 * du32[n].std() / math.sqrt(nrep) + ACC_TOL * scale
            # same-freq bf16 quantization gate (per replicate, max)
            q_err_u = np.abs(du16[n] - du32[n]).max()
            # the replicate weights the quantized samples by f with
            # E[f^2] = 2 (Poisson(1)), so the per-replicate quantization
            # second moment is up to ~2x the unweighted one
            q_gate_u = (
                5.0 * 2.0 * math.comb(n, 2) * abs(du_full[n - 2]) * q2_u
                + ACC_TOL * scale
            )
            q_err_x = np.abs(dx16[n] - dx32[n]).max()
            q_gate_x = (
                5.0
                * 2.0
                * (
                    math.comb(n, 2) * abs(dx_full[n - 2]) * q2_u
                    + n * abs(du_full[n - 1]) * math.sqrt(q2_x * q2_u)
                )
                + ACC_TOL * scale
            )
            report[f"{name}_du{n}"] = {
                "mean_err": float(f"{mean_err:.3g}"),
                "stat_gate": float(f"{stat_gate:.3g}"),
                "bf16_err": float(f"{q_err_u:.3g}"),
                "bf16_gate": float(f"{q_gate_u:.3g}"),
            }
            report[f"{name}_dxdu{n}"] = {
                "bf16_err": float(f"{q_err_x:.3g}"),
                "bf16_gate": float(f"{q_gate_x:.3g}"),
            }
            ok &= bool(mean_err < stat_gate)
            ok &= bool(q_err_u < q_gate_u and q_err_x < q_gate_x)

    def host(res):
        """Pull the (tiny) outputs and drop the device refs promptly —
        HBM holds the 1e8 streams in two dtypes plus the freq table."""
        return tuple(np.asarray(a, np.float64) for a in res)

    u16 = u.astype(jnp.bfloat16)
    x16 = x2.astype(jnp.bfloat16)

    # in-kernel Poisson bootstrap: same seed -> identical frequencies
    r32 = host(
        resample_central_comoments_poisson(u, x2, NREP_POISSON, ORDER, seed=11)
    )
    r16 = host(
        resample_central_comoments_poisson(
            u16, x16, NREP_POISSON, ORDER, seed=11
        )
    )
    gate_pair("poisson", r32, r16, NREP_POISSON)

    # freq-matmul kernel: shared device-generated Poisson table
    freq = jax.random.poisson(
        jax.random.key(3), 1.0, (NREP_FREQ, R)
    ).astype(jnp.int32)
    r32 = host(resample_central_comoments_fused(u, x2, freq, ORDER))
    r16 = host(resample_central_comoments_fused(u16, x16, freq, ORDER))
    gate_pair("freqmm", r32, r16, NREP_FREQ)

    report["q2_u"] = float(f"{q2_u:.3g}")
    report["q2_x"] = float(f"{q2_x:.3g}")
    report["ok"] = bool(ok)
    Path(__file__).parent.parent.joinpath(
        "ACCURACY_BOOTSTRAP_1E8.json"
    ).write_text(json.dumps(report, indent=1))
    print(json.dumps(report))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
