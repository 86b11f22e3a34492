"""HBM streaming-bandwidth roof microbench (VERDICT r2 item 1).

Measures the chip's ACHIEVABLE HBM bandwidth with trivial kernels and
reports the fused order-6 reduction as a percentage of that measured roof
— converting the "HBM-bound" claim from an assertion into evidence.

Methodology: every workload is chained K times inside ONE jitted
``lax.fori_loop`` (an ``optimization_barrier`` on the carried array
prevents CSE; the trip count is a traced argument so a single compile
serves every K).  Device time per iteration = ``(t(K=128) - t(K=8)) / 120``,
which cancels the fixed axon-tunnel dispatch overhead (bench.py
methodology).  The spread is deliberately huge for the trivial kernels:
a 400 MB read at ~900 GB/s is only ~0.45 ms/iter, so 120 differenced
iterations puts the interval at ~55 ms — comfortably above the ~20 ms
floor below which tunnel-noise min-differencing has produced 2-4x
inflated rates (CLAUDE.md round-3 notes).  Sync by scalar fetch
(block_until_ready is unreliable on this backend).

Workloads:

- ``sum``:  Pallas single-stream sum, f32 and bf16 (pure read: 4 / 2 B per
  element, one VPU add) — the lightest possible traffic per element; its
  best rate IS the read roof.
- ``copy``: Pallas block copy (read + write, 8 B per element at f32).
- ``xla_sum``: jnp.sum for an XLA-scheduled comparison point.
- ``fused``: the production order-6 fused comoment reduction (u + x
  streams: 8 B/sample f32, 4 B/sample bf16) on the 128-lane bitcast path
  (R % 128 == 0), plus a pad-fallback variant (R % 128 != 0) that
  measures the cost of the full relayout copy.

Writes HBM_ROOF.json and prints one JSON line.

Usage: python benches/bench_hbm_roof.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

R = 100_663_296  # 96 * 2^20: divisible by 1024 -> all packings are bitcasts
REPEATS = 3
K_LO, K_HI = 8, 128


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from thermoextrap_tpu.ops.moments_pallas import (
        reduce_central_comoments_fused,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller R, 1 repeat")
    args = ap.parse_args()

    on_accel = jax.default_backend() != "cpu"
    r = R if on_accel and not args.quick else 12_582_912
    repeats = 1 if args.quick else REPEATS

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    uv = 5.0 + jax.random.normal(k1, (r,), dtype=jnp.float32)
    xv = 2.0 + 0.5 * jax.random.normal(k2, (r,), dtype=jnp.float32)

    lanes = 1024
    rows_total = r // lanes

    # --- Pallas sum kernel (pure read) -----------------------------------
    def _sum_kernel(x_ref, o_ref, *, rows):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        x = x_ref[:].astype(jnp.float32)
        o_ref[:] += jnp.sum(x.reshape(rows // 8, 8, x.shape[-1]), axis=0)

    def psum_reduce(x2, rows):
        grid = x2.shape[0] // rows
        ln = x2.shape[1]
        (out,) = pl.pallas_call(
            functools.partial(_sum_kernel, rows=rows),
            grid=(grid,),
            in_specs=[pl.BlockSpec((rows, ln), lambda i: (i, 0))],
            out_specs=[pl.BlockSpec((8, ln), lambda i: (0, 0))],
            out_shape=[jax.ShapeDtypeStruct((8, ln), jnp.float32)],
        )(x2)
        return out.sum()

    # --- Pallas copy kernel (read + write) -------------------------------
    def _copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    def pcopy(x2, rows):
        grid = x2.shape[0] // rows
        ln = x2.shape[1]
        (out,) = pl.pallas_call(
            _copy_kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((rows, ln), lambda i: (i, 0))],
            out_specs=[pl.BlockSpec((rows, ln), lambda i: (i, 0))],
            out_shape=[jax.ShapeDtypeStruct(x2.shape, x2.dtype)],
        )(x2)
        return out

    # --- one-compile K-chained timing ------------------------------------
    def timed_rate(step, x, nbytes_per_iter):
        """step: carry -> (scalar, carry).  Returns GB/s or None."""

        @jax.jit
        def chain(x, k):
            def body(_, carry):
                acc, xx = carry
                xx = jax.lax.optimization_barrier(xx)
                s, xx = step(xx)
                return acc + s, xx

            acc, _ = jax.lax.fori_loop(
                0, k, body, (jnp.float32(0.0), x)
            )
            return acc

        def t_of(k):
            float(chain(x, k))  # warm (single compile, k is traced)
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                float(chain(x, k))
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo = t_of(K_LO)
        t_hi = t_of(K_HI)
        if t_hi <= t_lo:
            return None
        dt = (t_hi - t_lo) / (K_HI - K_LO)
        return nbytes_per_iter / dt / 1e9

    results = {}

    # block-size sweep for the sum kernel (find the real roof)
    best_sum = {}
    for dtype, bname in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x2 = uv.astype(dtype).reshape(rows_total, lanes)
        nbytes = 2 if dtype == jnp.bfloat16 else 4
        best = 0.0
        best_rows = None
        for block in (524288, 1048576, 2097152):
            rows = block // lanes
            if rows % 8 or rows_total % rows:
                continue
            gbps = timed_rate(
                lambda xx, rows=rows: (psum_reduce(xx, rows), xx),
                x2,
                r * nbytes,
            )
            if gbps is None:
                continue
            results[f"sum_{bname}_block{block}_gbps"] = round(gbps, 1)
            if gbps > best:
                best, best_rows = gbps, rows
        best_sum[bname] = best
        results[f"roof_sum_{bname}_gbps"] = round(best, 1)
        results[f"roof_sum_{bname}_rows"] = best_rows

    # copy kernel at the best f32 block size
    x2 = uv.reshape(rows_total, lanes)
    gbps = timed_rate(
        lambda xx: (xx[0, 0], pcopy(xx, results["roof_sum_f32_rows"] or 512)),
        x2,
        r * 8,
    )
    results["copy_f32_gbps"] = round(gbps, 1) if gbps else None

    # XLA sum comparison
    for dtype, bname, nb in ((jnp.float32, "f32", 4), (jnp.bfloat16, "bf16", 2)):
        gbps = timed_rate(
            lambda xx: (xx.sum(dtype=jnp.float32), xx),
            uv.astype(dtype),
            r * nb,
        )
        results[f"xla_sum_{bname}_gbps"] = round(gbps, 1) if gbps else None

    # the production fused reduction, same methodology; lanes=1024 case
    def fused_step(carry):
        u, x = carry
        out = reduce_central_comoments_fused(u, x, 6)
        return out[2][2], carry

    def timed_fused(u, x, spb):
        @jax.jit
        def chain(u, x, k):
            def body(_, carry):
                acc, uu, xx = carry
                uu, xx = jax.lax.optimization_barrier((uu, xx))
                out = reduce_central_comoments_fused(uu, xx, 6)
                return acc + out[2][2], uu, xx

            acc, _, _ = jax.lax.fori_loop(
                0, k, body, (jnp.float32(0.0), u, x)
            )
            return acc

        def t_of(k):
            float(chain(u, x, k))
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                float(chain(u, x, k))
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = t_of(K_LO), t_of(K_HI)
        if t_hi <= t_lo:
            return None, None
        dt = (t_hi - t_lo) / (K_HI - K_LO)
        return u.shape[0] * spb / dt / 1e9, u.shape[0] / dt / 1e9

    for dtype, bname, spb in ((jnp.float32, "f32", 8), (jnp.bfloat16, "bf16", 4)):
        gbps, gsps = timed_fused(uv.astype(dtype), xv.astype(dtype), spb)
        if gbps is None:
            continue
        results[f"fused_{bname}_gbps"] = round(gbps, 1)
        results[f"fused_{bname}_gsps"] = round(gsps, 2)
        roof = best_sum[bname]
        if roof:
            results[f"fused_{bname}_pct_of_roof"] = round(100 * gbps / roof, 1)

    # pad-fallback variant (R % 128 != 0: both streams relayout-copied)
    rpad = r + 100
    upad = 5.0 + jax.random.normal(k1, (rpad,), dtype=jnp.float32)
    xpad = 2.0 + 0.5 * jax.random.normal(k2, (rpad,), dtype=jnp.float32)
    gbps, gsps = timed_fused(upad, xpad, 8)
    if gbps is not None:
        results["fused_f32_padfallback_gbps"] = round(gbps, 1)
        results["fused_f32_padfallback_gsps"] = round(gsps, 2)

    results["r"] = r
    results["backend"] = jax.default_backend()
    out = Path(__file__).parent.parent / "HBM_ROOF.json"
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
