"""Chip throughput capture for every Pallas kernel variant.

The headline bench (bench.py) covers the flat V=1 reduction only; this
bench records the rest — vector-packed reduction, batched (x_is_u and
x!=u) reductions, freq-matmul and in-kernel Poisson bootstraps — in one
committed artifact (BENCH_KERNELS.json) so every fast path has a recorded
number on real hardware.

Timing notes (CLAUDE.md): per-call dispatch through the measurement tunnel
carries a ~4-7 ms fixed+noisy overhead, included in the apparent rates;
the flat V=1 reductions use the K-chained in-jit device-rate method of
bench.py, which removes it.  Synchronization is by scalar fetch
(block_until_ready is unreliable here).

Remote compiles are slow enough that the full suite can exceed a 10-min
wall-clock cap, so the run is RESUMABLE: each entry merges into the
existing BENCH_KERNELS.json as soon as it is measured, and ``--only
flat|batched|bootstrap`` restricts a run to one stage.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

REPEATS, ITERS = 3, 3


def _best(fn, sync):
    sync(fn())
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def main() -> None:
    from thermoextrap_tpu.ops.moments_pallas import (
        reduce_central_comoments_batched,
        reduce_central_comoments_fused,
        reduce_central_umoments_batched,
        resample_central_comoments_fused,
        resample_central_comoments_poisson,
    )
    from thermoextrap_tpu.ops.resample import freq_from_indices, random_indices

    order = 6
    art = Path(__file__).parent.parent / "BENCH_KERNELS.json"
    only = None
    for i, a in enumerate(sys.argv):
        if a == "--only":
            if i + 1 >= len(sys.argv) or sys.argv[i + 1] not in (
                "flat", "batched", "bootstrap",
            ):
                sys.exit("--only requires one of: flat, batched, bootstrap")
            only = sys.argv[i + 1]

    known_keys = {
        "metric", "order",
        "flat_f32_V1", "flat_bf16_V1", "flat_f32_V4",
        "batched_comoments_f32_B8_R1e7_V2", "batched_umoments_f32_B512_R1e6",
        "batched_umoments_f32_B512_R2p20",
        "bootstrap_freq_matmul_R2p20_nrep256",
        "bootstrap_freq_matmul_R2p20_nrep256_i8",
        "bootstrap_poisson_R1e7_nrep256", "bootstrap_poisson_R1e8_nrep256",
        "bootstrap_poisson_R1e8_nrep256_bf16",
        "bootstrap_poisson_batched_B64_R1e6_nrep256",
    }
    out: dict = {"metric": "pallas_kernel_suite_chip_rates", "order": order}
    if art.exists():
        try:
            prev = json.loads(art.read_text())
            if prev.get("order") == order:
                # keep only keys this script still produces — retired entry
                # names must not ride along in the artifact forever
                out.update({k: v for k, v in prev.items() if k in known_keys})
        except Exception:
            pass

    def record(key, value):
        out[key] = value
        art.write_text(json.dumps(out) + "\n")
        print(key, value, flush=True)

    def sync_reduce(o):
        return float(jnp.asarray(o[2]).reshape(-1)[0])

    R = 100_000_000
    k1, k2 = jax.random.split(jax.random.key(0))
    uv = 5.0 + jax.random.normal(k1, (R,), dtype=jnp.float32)
    xv1 = 2.0 + 0.5 * jax.random.normal(k2, (R,), dtype=jnp.float32)

    if only in (None, "flat"):

        @jax.jit
        def _chain(u, x, k):
            def body(_, carry):
                acc, uu, xx = carry
                uu, xx = jax.lax.optimization_barrier((uu, xx))
                o = reduce_central_comoments_fused(uu, xx, order)
                return acc + o[2][2], uu, xx

            acc, _, _ = jax.lax.fori_loop(
                0, k, body, (jnp.float32(0.0), u, x)
            )
            return acc

        def _chain_time(u, x, k):
            float(_chain(u, x, k))  # single compile; k is traced
            best = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                float(_chain(u, x, k))
                best = min(best, time.perf_counter() - t0)
            return best

        def flat_rates(u, x):
            # K-chained in-jit device rate (bench.py methodology): per-call
            # timing hits the tunnel noise floor at these kernel times
            t_lo, t_hi = _chain_time(u, x, 8), _chain_time(u, x, 48)
            tf = _best(
                lambda: reduce_central_comoments_fused(u, x, order), sync_reduce
            )
            return 40 * R / max(t_hi - t_lo, 1e-9) / 1e9, R / tf / 1e9

        m, a = flat_rates(uv, xv1)
        record(
            "flat_f32_V1",
            {"device_gsps": round(m, 2), "apparent_1e8_gsps": round(a, 2)},
        )
        m, a = flat_rates(uv.astype(jnp.bfloat16), xv1.astype(jnp.bfloat16))
        record(
            "flat_bf16_V1",
            {"device_gsps": round(m, 2), "apparent_1e8_gsps": round(a, 2)},
        )

        R4 = 25_000_000
        xv4 = 2.0 + 0.5 * jax.random.normal(k2, (R4, 4), dtype=jnp.float32)
        u4 = jax.block_until_ready(uv[:R4])
        t = _best(
            lambda: reduce_central_comoments_fused(u4, xv4, order), sync_reduce
        )
        record(
            "flat_f32_V4",
            {
                "apparent_2p5e7_gsps": round(R4 / t / 1e9, 2),
                "note": "per-sample rate; each sample carries 4 observable values",
            },
        )

    if only in (None, "batched"):
        B, Rb, V = 8, 10_000_000, 2
        ub = 5.0 + jax.random.normal(k1, (B, Rb), dtype=jnp.float32)
        xb = 2.0 + 0.5 * jax.random.normal(k2, (B, Rb, V), dtype=jnp.float32)
        t = _best(
            lambda: reduce_central_comoments_batched(ub, xb, order), sync_reduce
        )
        record(
            "batched_comoments_f32_B8_R1e7_V2",
            {"apparent_gsps": round(B * Rb / t / 1e9, 2)},
        )

        # R = 1e6 is NOT 128-divisible: this entry measures the pad-copy
        # fallback (a full (B, R) relayout per call); the 2^20 entry below
        # is the bitcast fast path — the difference is the documented cost
        # of a non-128-divisible sample count
        Bg, Rg = 512, 1_000_000
        ug = -10.0 + 1.5 * jax.random.normal(k1, (Bg, Rg), dtype=jnp.float32)
        t = _best(
            lambda: reduce_central_umoments_batched(ug, order),
            lambda o: float(o[1][2, 0]),
        )
        record(
            "batched_umoments_f32_B512_R1e6",
            {"apparent_gsps": round(Bg * Rg / t / 1e9, 2),
             "note": "R%128!=0: pad-copy fallback path"},
        )
        Rg2 = 1 << 20
        ug2 = -10.0 + 1.5 * jax.random.normal(k1, (Bg, Rg2), dtype=jnp.float32)
        t = _best(
            lambda: reduce_central_umoments_batched(ug2, order),
            lambda o: float(o[1][2, 0]),
        )
        record(
            "batched_umoments_f32_B512_R2p20",
            {"apparent_gsps": round(Bg * Rg2 / t / 1e9, 2),
             "note": "128-divisible R: zero-copy bitcast path"},
        )
        # free the ~5 GB of batched operands before the bootstrap section:
        # together with the 1e8 flat streams and the (nrep, R) freq-table
        # scatter temporaries they overflowed HBM (observed
        # RESOURCE_EXHAUSTED at freq_from_indices, round 4)
        for _arr in (ub, xb, ug, ug2):
            _arr.delete()
        del ub, xb, ug, ug2

    if only in (None, "bootstrap"):
        # 128-divisible R: the int32 freq table bitcasts (no cast/pad copy)
        Rr, nrep = 1_048_576, 256
        ur = jax.block_until_ready(uv[:Rr])
        xr = jax.block_until_ready(xv1[:Rr].reshape(Rr, 1))
        freq = freq_from_indices(random_indices(jax.random.key(3), nrep, Rr), Rr)
        t = _best(
            lambda: resample_central_comoments_fused(ur, xr, freq, order),
            sync_reduce,
        )

        # device rate via the K-chained in-jit method (the ~2 ms kernel is
        # far below the tunnel's per-call overhead); WIDE 8-vs-64 spread so
        # the differenced interval stays above the min-differencing bias
        # floor (~20 ms, CLAUDE.md methodology note)
        def _boot_chain_time(ftab, k):
            @jax.jit
            def _chain(u, x, f, kk):
                def body(_, carry):
                    acc, uu, xx, ff = carry
                    uu, xx, ff = jax.lax.optimization_barrier((uu, xx, ff))
                    o = resample_central_comoments_fused(uu, xx, ff, order)
                    return acc + o[2][2, 0], uu, xx, ff

                acc, _, _, _ = jax.lax.fori_loop(
                    0, kk, body, (jnp.float32(0.0), u, x, f)
                )
                return acc

            float(_chain(ur, xr, ftab, jnp.int32(k)))
            best = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                float(_chain(ur, xr, ftab, jnp.int32(k)))
                best = min(best, time.perf_counter() - t0)
            return best

        def _boot_device(ftab):
            t_lo, t_hi = _boot_chain_time(ftab, 8), _boot_chain_time(ftab, 64)
            return 56 * nrep * Rr / max(t_hi - t_lo, 1e-9) / 1e12

        record(
            "bootstrap_freq_matmul_R2p20_nrep256",
            {
                "trep_samples_per_s": round(nrep * Rr / t / 1e12, 3),
                "device_treps": round(_boot_device(freq), 3),
            },
        )
        # int8 table: 4x less table traffic (the dominant stream), opt-in
        # via freq_from_indices(dtype=jnp.int8)
        f8 = jax.block_until_ready(freq.astype(jnp.int8))
        record(
            "bootstrap_freq_matmul_R2p20_nrep256_i8",
            {"device_treps": round(_boot_device(f8), 3)},
        )

        for rp in (10_000_000, 100_000_000):
            up = jax.block_until_ready(uv[:rp])
            xp = jax.block_until_ready(xv1[:rp].reshape(rp, 1))
            t = _best(
                lambda: resample_central_comoments_poisson(
                    up, xp, nrep, order, seed=1
                ),
                sync_reduce,
            )
            record(
                f"bootstrap_poisson_R{rp:.0e}_nrep256".replace("+0", ""),
                {
                    "trep_samples_per_s": round(nrep * rp / t / 1e12, 3),
                    "wallclock_s": round(t, 3),
                },
            )

        # bf16 sample stream (VERDICT r3: the Poisson kernel's only HBM
        # traffic IS the sample stream — bf16 halves it; if the rate does
        # not move the kernel is PRNG/compute-bound, which this entry
        # documents either way)
        up16 = jax.block_until_ready(uv.astype(jnp.bfloat16))
        xp16 = jax.block_until_ready(
            xv1.reshape(R, 1).astype(jnp.bfloat16)
        )
        t = _best(
            lambda: resample_central_comoments_poisson(
                up16, xp16, nrep, order, seed=1
            ),
            sync_reduce,
        )
        record(
            "bootstrap_poisson_R1e8_nrep256_bf16",
            {
                "trep_samples_per_s": round(nrep * R / t / 1e12, 3),
                "wallclock_s": round(t, 3),
            },
        )

        # batched-grid Poisson bootstrap (the lnPi uncertainty path)
        from thermoextrap_tpu.ops.moments_pallas import (
            resample_central_umoments_batched_poisson,
        )

        Bg2, Rg2 = 64, 1_000_000
        ug2 = -10.0 + 1.5 * jax.random.normal(
            jax.random.key(5), (Bg2, Rg2), dtype=jnp.float32
        )
        t = _best(
            lambda: resample_central_umoments_batched_poisson(
                ug2, nrep, order, seed=2
            ),
            lambda o: float(o[1][2, 0, 0]),
        )
        record(
            "bootstrap_poisson_batched_B64_R1e6_nrep256",
            {
                "trep_samples_per_s": round(nrep * Bg2 * Rg2 / t / 1e12, 3),
                "wallclock_s": round(t, 3),
            },
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
