"""K-chained DEVICE rates for the perturb serving path (round 5).

The apparent stage times all landed at 27-38 ms regardless of content
(na-scaling ratio 0.98, pred layouts identical) — i.e. they are the
tunnel's fixed per-call overhead at these operand sizes, as bench.py's
apparent-vs-device gap already showed for the 1e8 reduce (26 ms apparent
vs ~1 ms device).  This bench K-chains the pipeline body per the
CLAUDE.md methodology (traced trip count, optimization_barrier carry,
wide spread) to get the honest device-side numbers.

Appends to PERTURB_DECOMP.json.  Run: python benches/bench_perturb_kchain.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

R = 10_000_000
NREP = 128
A = 5
BETA0 = 2.0
REPEATS = 3
K_LO, K_HI = 4, 24
OUT = Path(__file__).parent.parent / "PERTURB_DECOMP.json"

results = json.loads(OUT.read_text()) if OUT.exists() else {}


def record(k, v):
    results[k] = v
    OUT.write_text(json.dumps(results, indent=2))
    print(json.dumps({k: v}), flush=True)


def main() -> None:
    from thermoextrap_tpu.ops.moments_pallas import resample_perturb_poisson
    from thermoextrap_tpu.pipeline import _perturb_predict, _perturb_weights

    key = jax.random.key(0)
    ku, kx = jax.random.split(key)
    uv = jax.block_until_ready(3.0 + jax.random.normal(ku, (R,), dtype=jnp.float32))
    xv = jax.block_until_ready(
        1.0 + 0.5 * jax.random.normal(kx, (R, 1), dtype=jnp.float32)
    )
    dalpha = jnp.asarray(np.linspace(-0.2, 0.2, A), jnp.float32)

    def chain_time(step, k):
        @jax.jit
        def _chain(u, x, kk):
            def body(i, carry):
                acc, uu, xx = carry
                uu, xx = jax.lax.optimization_barrier((uu, xx))
                return acc + step(uu, xx, i), uu, xx

            acc, *_ = jax.lax.fori_loop(0, kk, body, (jnp.float32(0.0), u, x))
            return acc

        float(_chain(uv, xv, jnp.int32(k)))
        b = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(_chain(uv, xv, jnp.int32(k)))
            b = min(b, time.perf_counter() - t0)
        return b

    def device_s(step):
        t_lo = chain_time(step, K_LO)
        t_hi = chain_time(step, K_HI)
        return (t_hi - t_lo) / (K_HI - K_LO), t_hi - t_lo

    # full device-mode CI body: e build + pred + kernel + std
    def full_ci(u, x, i):
        e = _perturb_weights(u, dalpha, None)
        pred = _perturb_predict(e, x)
        s = resample_perturb_poisson(e, x, NREP, seed=i)
        bpred = s[..., :1] / s[..., 1:]
        return pred[0, 0] + bpred.std(axis=1)[0, 0]

    t, delta = device_s(full_ci)
    record("device_full_ci_s_per_call", round(t, 5))
    record("device_full_ci_chain_delta_s", round(delta, 4))
    record(
        "device_full_ci_greps_bench_units", round(NREP * R / t / 1e9, 1)
    )
    record(
        "device_full_ci_grep_samples_per_s",
        round(A * NREP * R / t / 1e9, 1),
    )

    # kernel alone (e passed through the carry barrier? e depends on u —
    # rebuild per step; its cost shows in the pred-only chain below)
    def kern_only(u, x, i):
        e = _perturb_weights(u, dalpha, None)
        s = resample_perturb_poisson(e, x, NREP, seed=i)
        return s[0, 0, 0]

    t, _ = device_s(kern_only)
    record("device_kernel_incl_e_s_per_call", round(t, 5))

    # pred alone (e build + fused reduce)
    def pred_only(u, x, i):
        e = _perturb_weights(u, dalpha, None)
        return _perturb_predict(e, x)[0, 0]

    t, _ = device_s(pred_only)
    record("device_pred_incl_e_s_per_call", round(t, 5))


if __name__ == "__main__":
    main()
