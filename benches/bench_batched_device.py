"""Device rates for the BATCHED moment kernels (K-chained methodology).

BENCH_KERNELS.json records only single-call "apparent" rates for the
batched u-moment / comoment kernels (lnΠ macrostate grids and
arbitrary-batch reductions); at these wall-clocks the ~5 ms tunnel
dispatch is a large fraction of the call, so the apparent numbers say
little about the kernels.  This bench applies the same K-chained in-jit
differencing as bench.py / bench_kernels.py to get honest device rates,
and records the flat kernel's rate at the same total sample count as the
roofline anchor (the batched kernel reads the same bytes; any gap is
grid/accumulator overhead of the per-row formulation).

Writes BENCH_BATCHED.json.  Run on the real chip; ~2-4 min (a handful of
kernel compiles).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from thermoextrap_tpu.ops.moments_pallas import (
    reduce_central_comoments_batched,
    reduce_central_comoments_fused,
    reduce_central_umoments_batched,
)

REPEATS = 3
ORDER = 6


def _chain_time(fn, operands, k):
    """Best-of-REPEATS wall-clock of k chained kernel calls in ONE jit."""

    @jax.jit
    def chain(ops, kk):
        def body(_, carry):
            acc, inner = carry
            inner = jax.lax.optimization_barrier(inner)
            acc = acc + fn(inner)
            return acc, inner

        acc, _ = jax.lax.fori_loop(0, kk, body, (jnp.float32(0.0), ops))
        return acc

    float(chain(operands, k))  # compile once (k is traced)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(chain(operands, k))
        best = min(best, time.perf_counter() - t0)
    return best


def _device_rate(fn, operands, nsamples, k_lo=4, k_hi=20):
    t_lo = _chain_time(fn, operands, k_lo)
    t_hi = _chain_time(fn, operands, k_hi)
    return (k_hi - k_lo) * nsamples / max(t_hi - t_lo, 1e-9) / 1e9


def main() -> None:
    out = {"metric": "batched_kernel_device_rates", "order": ORDER}
    art = Path(__file__).parent.parent / "BENCH_BATCHED.json"

    def record(key, value):
        out[key] = value
        art.write_text(json.dumps(out) + "\n")
        print(key, value, flush=True)

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)

    # lnPi-grid shape: 512 macrostates x 2^20 samples (bitcast path)
    b, r = 512, 1 << 20
    uv = jax.block_until_ready(
        5.0 + jax.random.normal(k1, (b, r), dtype=jnp.float32)
    )
    rate = _device_rate(
        lambda ops: reduce_central_umoments_batched(ops[0], ORDER)[1][2].sum(),
        (uv,),
        b * r,
    )
    record("umoments_batched_B512_R2p20_device_gsps", round(rate, 2))

    # flat anchor at the same total sample count (u-only stream: pass x=u
    # routes the half-traffic u-moment path via the x_is_u dispatch; use
    # the fused comoment kernel's u+x streams as the 8-byte/sample anchor
    # instead, which BENCH_KERNELS already records at ~91-98 Gs/s)
    flat_u = uv.reshape(-1)
    flat_x = jax.block_until_ready(
        2.0 + 0.5 * jax.random.normal(k2, (b * r,), dtype=jnp.float32)
    )
    rate = _device_rate(
        lambda ops: reduce_central_comoments_fused(ops[0], ops[1], ORDER)[2][2],
        (flat_u, flat_x),
        b * r,
    )
    record("flat_fused_anchor_same_R_device_gsps", round(rate, 2))

    # batched comoment kernel: 8 batch rows x 1e7 x V=2
    b2, r2, v2 = 8, 10_000_000, 2
    uv2 = jax.block_until_ready(
        5.0 + jax.random.normal(k1, (b2, r2), dtype=jnp.float32)
    )
    xv2 = jax.block_until_ready(
        2.0 + 0.5 * jax.random.normal(k2, (b2, r2, v2), dtype=jnp.float32)
    )
    rate = _device_rate(
        lambda ops: reduce_central_comoments_batched(ops[0], ops[1], ORDER)[2][
            2
        ].sum(),
        (uv2, xv2),
        b2 * r2,
    )
    record("comoments_batched_B8_R1e7_V2_device_gsps", round(rate, 2))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
