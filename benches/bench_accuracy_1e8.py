"""On-chip accuracy gate at north-star scale (R = 1e8, order 6).

Runs the fused Pallas reduction (f32 and bf16 input streams) on the real
TPU chip and compares against an exact f64 reference computed on the SAME
data.  Bulk host<->device transfers are infeasible over the measurement
tunnel, so both sides regenerate the data from the same jax.random keys
(threefry is bit-deterministic; a 1000-sample prefix is asserted equal to
catch any backend divergence) — the reference runs in a CPU subprocess
with exact chunked f64 accumulation.

Gates (asserted, printed as one JSON line):

- f32 kernel: single-pass shifted f32 accumulation within ``F32_RTOL`` of
  f64 on the natural scale ``sigma_u^n`` of each moment.  (The shift is
  estimated from the first 8192 samples; recentering is algebraically
  exact, so the only error is f32 roundoff of the partial-sum tree.)
- bf16 kernel: |error| <= 5x the delta-method quantization-bias bound
  ``C(n,2) du_{n-2} E[q^2]`` + 3x the estimator's sampling sigma (same
  gate as tests/test_parallel.py::test_bf16_reduce_accuracy, at the full
  1e8 where the bias is comparable to one sampling sigma).

Analogue of the reference's statistical CI tests
(/root/reference/tests/test_beta.py:77-129) at production scale.
"""

from __future__ import annotations

import json
import math
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

R = 100_000_000
ORDER = 6
CHUNK = 10_000_000
F32_RTOL = 1e-4  # on the sigma_u^n scale


def gen(jnp, jrandom, r):
    """Deterministic f32 data stream (identical on every backend)."""
    k1, k2 = jrandom.split(jrandom.key(7))
    u = (5.0 + jrandom.normal(k1, (r,), dtype=jnp.float32)).astype(jnp.float32)
    n2 = jrandom.normal(k2, (r,), dtype=jnp.float32)
    x = (2.0 + 0.3 * (u - 5.0) + 0.5 * n2).astype(jnp.float32)
    return u, x


def host_reference() -> None:
    """CPU subprocess: exact f64 moments + quantization/sampling stats."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import jax.random as jrandom
    import ml_dtypes
    import numpy as np

    u_d, x_d = gen(jnp, jrandom, R)
    u = np.asarray(u_d)
    x = np.asarray(x_d)

    shift_u = np.float64(u[:8192]).mean()
    shift_x = np.float64(x[:8192]).mean()
    sums_u = np.zeros(ORDER + 1)
    sums_x = np.zeros(ORDER + 1)
    q2_u = q2_x = 0.0
    for lo in range(0, R, CHUNK):
        uc = np.float64(u[lo : lo + CHUNK])
        xc = np.float64(x[lo : lo + CHUNK])
        a = uc - shift_u
        s = xc - shift_x
        p = np.ones_like(a)
        for n in range(ORDER + 1):
            sums_u[n] += p.sum()
            sums_x[n] += (p * s).sum()
            if n < ORDER:
                p = p * a
        q2_u += ((uc - np.float64(u[lo : lo + CHUNK].astype(ml_dtypes.bfloat16).astype(np.float32))) ** 2).sum()
        q2_x += ((xc - np.float64(x[lo : lo + CHUNK].astype(ml_dtypes.bfloat16).astype(np.float32))) ** 2).sum()
    q2_u /= R
    q2_x /= R

    m = sums_u / sums_u[0]
    c = sums_x / sums_u[0]
    du = np.zeros(ORDER + 1)
    dx = np.zeros(ORDER + 1)
    for n in range(ORDER + 1):
        du[n] = sum(math.comb(n, k) * m[k] * (-m[1]) ** (n - k) for k in range(n + 1))
        dx[n] = (
            sum(math.comb(n, k) * c[k] * (-m[1]) ** (n - k) for k in range(n + 1))
            - c[0] * du[n]
        )
    du[0], du[1], dx[0] = 1.0, 0.0, 0.0

    # sampling sigma of each estimator (exact, chunked)
    umean = m[1] + shift_u
    xmean = c[0] + shift_x
    sig_u = np.zeros(ORDER + 1)
    sig_x = np.zeros(ORDER + 1)
    for lo in range(0, R, CHUNK):
        a = np.float64(u[lo : lo + CHUNK]) - umean
        s = np.float64(x[lo : lo + CHUNK]) - xmean
        pn = a * a
        for n in range(2, ORDER + 1):
            sig_u[n] += ((pn - du[n]) ** 2).sum()
            sig_x[n] += ((s * pn - dx[n]) ** 2).sum()
            if n < ORDER:
                pn = pn * a
    sig_u = np.sqrt(sig_u / R) / np.sqrt(R)
    sig_x = np.sqrt(sig_x / R) / np.sqrt(R)

    print(
        json.dumps(
            {
                "du": du.tolist(),
                "dx": dx.tolist(),
                "q2_u": q2_u,
                "q2_x": q2_x,
                "sig_u": sig_u.tolist(),
                "sig_x": sig_x.tolist(),
                "sigma_u": float(np.sqrt(du[2])),
                "prefix_u": np.float64(u[:1000]).sum(),
                "prefix_x": np.float64(x[:1000]).sum(),
            }
        )
    )


def main() -> None:
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, __file__, "--host-reference"],
        capture_output=True,
        text=True,
        timeout=3600,
        check=True,
    )
    ref = json.loads(proc.stdout.strip().splitlines()[-1])
    t_ref = time.perf_counter() - t0

    import jax
    import jax.numpy as jnp
    import jax.random as jrandom
    import numpy as np

    from thermoextrap_tpu.ops.moments_pallas import (
        reduce_central_comoments_fused,
    )

    u, x = gen(jnp, jrandom, R)
    # backend-divergence check on a tiny prefix (threefry is deterministic,
    # erfinv rounding could differ in ulps across backends).  The prefix is
    # summed on HOST in f64: an on-device f32 sum of ~5000 has intrinsic
    # roundoff ~1e-3 — the same order as a real divergence — so an
    # f32-accumulated comparison would be flaky from summation order alone.
    pu = float(np.sum(np.asarray(u[:1000], np.float64)))
    assert abs(pu - ref["prefix_u"]) < 1e-3, (pu, ref["prefix_u"])

    def run(uu, xx):
        out = reduce_central_comoments_fused(uu, xx[:, None], ORDER)
        return (
            np.asarray(out[2], np.float64),
            np.asarray(out[3], np.float64).reshape(ORDER + 1),
        )

    du32, dx32 = run(u, x)
    du16, dx16 = run(u.astype(jnp.bfloat16), x.astype(jnp.bfloat16))

    du_ref = np.asarray(ref["du"])
    dx_ref = np.asarray(ref["dx"])
    sig_u = np.asarray(ref["sig_u"])
    sig_x = np.asarray(ref["sig_x"])
    q2_u, q2_x = ref["q2_u"], ref["q2_x"]
    sigma_u = ref["sigma_u"]

    report = {
        "metric": "accuracy_gate_1e8_order6",
        "host_f64_ref_s": round(t_ref, 1),
    }
    ok = True
    for n in range(2, ORDER + 1):
        scale = sigma_u**n
        err32_u = abs(du32[n] - du_ref[n]) / scale
        err32_x = abs(dx32[n] - dx_ref[n]) / scale
        gate_u = 5.0 * math.comb(n, 2) * abs(du_ref[n - 2]) * q2_u + 3.0 * sig_u[n]
        gate_x = (
            5.0
            * (
                math.comb(n, 2) * abs(dx_ref[n - 2]) * q2_u
                + n * abs(du_ref[n - 1]) * math.sqrt(q2_x * q2_u)
            )
            + 3.0 * sig_x[n]
        )
        err16_u = abs(du16[n] - du_ref[n])
        err16_x = abs(dx16[n] - dx_ref[n])
        report[f"du{n}"] = {
            "f32_rel_err": float(f"{err32_u:.3g}"),
            "bf16_abs_err": float(f"{err16_u:.3g}"),
            "bf16_gate": float(f"{gate_u:.3g}"),
            "sampling_sigma": float(f"{sig_u[n]:.3g}"),
        }
        report[f"dxdu{n}"] = {
            "f32_rel_err": float(f"{err32_x:.3g}"),
            "bf16_abs_err": float(f"{err16_x:.3g}"),
            "bf16_gate": float(f"{gate_x:.3g}"),
        }
        ok &= bool(err32_u < F32_RTOL and err32_x < F32_RTOL)
        ok &= bool(err16_u < gate_u and err16_x < gate_x)
    report["ok"] = bool(ok)
    print(json.dumps(report))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    if "--host-reference" in sys.argv:
        host_reference()
    else:
        main()
