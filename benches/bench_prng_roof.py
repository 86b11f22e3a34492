"""Hardware-PRNG throughput roof microbench.

The on-chip Poisson bootstrap kernel (ops/moments_pallas.py
``resample_central_comoments_poisson``) draws one u32 per (replicate,
sample) pair from ``pltpu.prng_random_bits``.  BENCH_KERNELS.json shows
it sustaining ~60 G rep-samples/s at R=1e8, nrep=256 — only ~1/3 of the
VPU issue rate the fused bf16 reduction demonstrates — and bf16 sample
streams do not move it, so it is not HBM-bound.  This bench isolates the
remaining suspect: the raw generation rate of the hardware PRNG itself,
plus the incremental cost of the 9-threshold Poisson(1) inverse-CDF
transform.

Workloads (all VMEM-resident — zero HBM sample traffic — so the ONLY
cost is generation + transform):

- ``draw``:         prng_random_bits((rows,128)) per step, one add to keep it live.
- ``draw_poisson``: same draws + the 9-cutoff comparison sum (the exact
                    transform the production kernel uses).
- ``draw_dot``:     same draws + Poisson transform + the (128,128)@(128,7)
                    MXU contraction — the production kernel's full
                    per-subrow recipe minus the sample stream.

Timing: identical K-chained in-jit methodology to bench_hbm_roof.py
(traced trip count, optimization_barrier, K = 8 vs 128 differenced,
scalar-fetch sync).

Writes PRNG_ROOF.json and prints one JSON line.

Usage: python benches/bench_prng_roof.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

REPEATS = 3
K_LO, K_HI = 8, 128
DRAWS_PER_STEP = 1 << 26  # 64 Mi u32 per kernel call


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from thermoextrap_tpu.ops.moments_pallas import _POISSON1_CDF

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    on_accel = jax.default_backend() != "cpu"
    draws = DRAWS_PER_STEP if on_accel and not args.quick else 1 << 20
    repeats = 1 if args.quick else REPEATS

    lanes = 128
    rep_block = 128  # production rep_block: draws come in (128,128) tiles
    tiles = draws // (rep_block * lanes)

    def _kernel(seed_ref, o_ref, *, mode):
        # the PRNG is stateful, so the tile loop body needs no index —
        # an in-kernel fori_loop keeps compile time flat (a 4096-way
        # Python unroll takes minutes through the remote compile service)
        pltpu.prng_seed(seed_ref[0, 0], pl.program_id(0))

        def body(_, acc):
            bits = pltpu.prng_random_bits((rep_block, lanes))
            bits = pltpu.bitcast(bits, jnp.uint32)
            if mode == "draw":
                # cheapest possible liveness: one add of an 8-row slice
                # (u32->f32 casts are unsupported in Mosaic; go via i32)
                return acc + pltpu.bitcast(bits[:8], jnp.int32).astype(
                    jnp.float32
                )
            f = jnp.zeros((rep_block, lanes), jnp.float32)
            for cdf in _POISSON1_CDF:
                thr = jnp.uint32(int(cdf * 4294967296.0))
                f = f + (bits > thr).astype(jnp.float32)
            if mode == "draw_poisson":
                return acc + f.reshape(rep_block // 8, 8, lanes).sum(0)
            # draw_dot: production per-subrow MXU contraction
            p = jnp.ones((7, lanes), jnp.float32)
            acc_d = jax.lax.dot_general(
                f,
                p,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (rep_block, 7)
            return acc + jnp.pad(
                acc_d, ((0, 0), (0, lanes - 7))
            ).reshape(rep_block // 8, 8, lanes).sum(0)

        o_ref[:] = jax.lax.fori_loop(
            0, tiles, body, jnp.zeros((8, lanes), jnp.float32)
        )

    def run_mode(mode):
        (out,) = pl.pallas_call(
            functools.partial(_kernel, mode=mode),
            grid=(1,),
            in_specs=[
                pl.BlockSpec(
                    (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
                )
            ],
            out_specs=[pl.BlockSpec((8, lanes), lambda i: (0, 0))],
            out_shape=[jax.ShapeDtypeStruct((8, lanes), jnp.float32)],
        )(jnp.full((1, 1), 1234, jnp.int32))
        return out.sum()

    def timed_gdraws(mode):
        @jax.jit
        def chain(k):
            def body(_, acc):
                acc = jax.lax.optimization_barrier(acc)
                return acc + run_mode(mode)

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        def t_of(k):
            float(chain(k))
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                float(chain(k))
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = t_of(K_LO), t_of(K_HI)
        if t_hi <= t_lo:
            return None
        dt = (t_hi - t_lo) / (K_HI - K_LO)
        return draws / dt / 1e9

    results = {}
    for mode in ("draw", "draw_poisson", "draw_dot"):
        rate = timed_gdraws(mode)
        results[f"{mode}_gdraws_per_s"] = round(rate, 2) if rate else None

    # context: the production kernel's measured rep-sample rate
    bk = Path(__file__).parent.parent / "BENCH_KERNELS.json"
    if bk.exists():
        try:
            kern = json.loads(bk.read_text())
            t = kern.get("bootstrap_poisson_R1e8_nrep256", {}).get(
                "trep_samples_per_s"
            )
            if t:
                results["production_poisson_grep_samples_per_s"] = t * 1000
        except Exception:
            pass

    results["draws_per_step"] = draws
    results["backend"] = jax.default_backend()
    out = Path(__file__).parent.parent / "PRNG_ROOF.json"
    out.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
