"""Benchmark: order-6 beta-derivative moment-reduction throughput.

BASELINE.json headline metric: samples/sec for the fused central comoment
reduction (order 6) that feeds the beta-derivative engine — the workload the
reference delegates to cmomy/numba on a 64-core CPU node.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Methodology (all documented in the extras):

- ``value`` is the **device throughput** of the bf16-input fused kernel,
  measured by chaining K kernel invocations inside ONE jitted
  ``lax.fori_loop`` (an ``optimization_barrier`` on the carried arrays
  prevents CSE; the trip count is a traced argument so one compile serves
  every K) and differencing two chain lengths: ``(K_HI-K_LO) R /
  (t(K_HI) - t(K_LO))``.  This removes the ~4-7 ms *fixed and noisy*
  remote-dispatch overhead of this measurement tunnel (per-call HTTP round
  trip of the axon backend); the wide K spread (8 vs 128) keeps the
  differenced interval (tens of ms) far above the tunnel timing noise.
  A production pipeline embeds the reduction inside one jitted program,
  where the per-call cost does not exist.  Apparent single-call rates at
  1e8 are reported alongside (``apparent_*``) for continuity with
  BENCH_r01.
- bf16 inputs halve HBM traffic; the quantization effect on the moments is
  bounded well below (R<=1e7) or at (R=1e8) one sampling-noise sigma — see
  tests/test_parallel.py::test_bf16_reduce_accuracy and
  benches/bench_accuracy_1e8.py for the measured gates.  The f32 rate is
  reported as ``device_f32_gsps``.
- ``hbm_roof_gbps`` / ``pct_of_roof``: the chip's measured achievable
  read bandwidth (pure-stream sum kernel, benches/bench_hbm_roof.py) and
  the f32 kernel's fraction of it — the f32 kernel streams 8 B/sample, so
  ``pct_of_roof = 8 * device_f32_gsps / roof``.  (bf16 streams 4 B/sample
  and is VPU-bound, not bandwidth-bound, at its higher rate.)
- ``vs_baseline``: this host has a SINGLE CPU core (nproc=1), so a measured
  multicore baseline is impossible here.  The per-core rate is the MEASURED
  compiled single-core rate from BASELINE.json.published (native C++ fused
  single-pass f64 engine — the cmomy/numba stand-in, ~5x the numpy floor;
  benches/bench_baseline_ref.py), projected to the reference's 64-core node
  assuming PERFECT linear scaling.  Sanity check: 64 x 1.35 GB/s of f64
  stream traffic = 86 GB/s, under a typical node's 200-400 GB/s DRAM, so
  the projection is core-bound and the linear assumption is not DRAM-capped
  — 5.4 Gs/s is a fair node estimate, and the DRAM ceiling itself (12-25
  Gs/s) is still far below the measured device rates.  Falls back to
  numpy/torch measured in-process if the artifact is absent.

Timing: on the axon backend ``block_until_ready`` does not reliably wait;
runs are synchronized by fetching a scalar.  Best-of-repeats filters the
~±30% tunnel timing noise.
"""

from __future__ import annotations

import functools
import json
import time
from pathlib import Path

import numpy as np

ORDER = 6
R = 100_000_000  # 1e8 samples (north-star size, BASELINE.md); 1e8 % 128 == 0
REPEATS = 5
# the bf16 kernel finishes 1e8 samples in ~0.6 ms, so the differenced
# interval must span many calls to sit far above the ~20 ms level where
# tunnel noise corrupts min-differencing (CLAUDE.md timing methodology):
# 120 calls ~ 77 ms bf16 / ~130 ms f32
K_LO, K_HI = 8, 128
BASELINE_R = 20_000_000
BASELINE_CORES = 64  # reference hardware (BASELINE.md row 1)


def numpy_two_pass(u, x, order):
    ubar = u.mean()
    xbar = x.mean()
    du = u - ubar
    dx = x - xbar
    p = np.ones_like(u)
    out_u = [np.float64(1.0)]
    out_xu = [dx.mean()]
    for _ in range(order):
        p = p * du
        out_u.append(p.mean())
        out_xu.append((p * dx).mean())
    return np.stack(out_u), np.stack(out_xu)


def torch_two_pass_rate(r):
    """Single-core torch two-pass rate (samples/s); None if torch is missing."""
    try:
        import torch
    except Exception:  # pragma: no cover
        return None
    torch.set_num_threads(1)  # the labeled quantity is a SINGLE-core rate
    g = torch.Generator().manual_seed(0)
    u = torch.randn(r, generator=g) + 5.0
    x = torch.randn(r, generator=g) * 0.5 + 2.0

    def run():
        du = u - u.mean()
        dx = x - x.mean()
        p = torch.ones_like(u)
        outs = [dx.mean()]
        for _ in range(ORDER):
            p = p * du
            outs.append(p.mean())
            outs.append((p * dx).mean())
        return outs

    run()
    best = float("inf")
    for _ in range(6):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return r / best


def main() -> None:
    import jax
    import jax.numpy as jnp

    from thermoextrap_tpu.ops.moments_pallas import reduce_central_comoments_fused

    on_accel = jax.default_backend() != "cpu"
    r_full = R if on_accel else 2_000_000

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    uv = 5.0 + jax.random.normal(k1, (r_full,), dtype=jnp.float32)
    xv = 2.0 + 0.5 * jax.random.normal(k2, (r_full,), dtype=jnp.float32)

    def sync(out):
        return float(out[2][2])

    def best_time(fn):
        sync(fn())  # compile + warm
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    @jax.jit
    def _chain(u, x, k):
        def body(_, carry):
            acc, uu, xx = carry
            uu, xx = jax.lax.optimization_barrier((uu, xx))
            out = reduce_central_comoments_fused(uu, xx, ORDER)
            return acc + out[2][2], uu, xx

        acc, _, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), u, x))
        return acc

    def _chain_time(u, x, k):
        float(_chain(u, x, k))  # warm (single compile; k is traced)
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(_chain(u, x, k))  # scalar fetch = sync
            best = min(best, time.perf_counter() - t0)
        return best

    def measure(u, x):
        if not on_accel:
            from thermoextrap_tpu.ops.moments import reduce_central_comoments

            t = best_time(lambda: reduce_central_comoments(u, x, ORDER))
            return r_full / t, r_full / t
        t_lo = _chain_time(u, x, K_LO)
        t_hi = _chain_time(u, x, K_HI)
        t_single = best_time(
            lambda: reduce_central_comoments_fused(u, x, ORDER)
        )
        if t_hi <= t_lo:
            # degenerate timing (severe tunnel noise): report the apparent
            # rate rather than an absurd 1/epsilon headline
            return r_full / t_single, r_full / t_single
        return (K_HI - K_LO) * r_full / (t_hi - t_lo), r_full / t_single

    device_bf16, apparent_bf16 = measure(
        uv.astype(jnp.bfloat16), xv.astype(jnp.bfloat16)
    )
    device_f32, apparent_f32 = measure(uv, xv)

    # single-core CPU baseline, projected to the reference node core count
    # assuming perfect linear scaling.  Preferred source: the MEASURED
    # compiled per-core rate from benches/bench_baseline_ref.py
    # (BASELINE.json.published — native C++ fused single-pass on f64, the
    # cmomy/numba stand-in; ~5x the numpy two-pass floor).  Fallback when
    # the artifact is absent: measure numpy/torch here.
    single_core = None
    baseline_impl = None
    try:
        pub = json.loads(
            (Path(__file__).parent / "BASELINE.json").read_text()
        ).get("published", {})
        if pub.get("per_core_baseline_gsps"):
            single_core = pub["per_core_baseline_gsps"] * 1e9
            baseline_impl = pub.get("per_core_baseline_impl")
    except Exception:
        pass
    if single_core is None:
        rng = np.random.default_rng(0)
        ub = rng.normal(5.0, 1.0, BASELINE_R).astype(np.float32)
        xb = rng.normal(2.0, 0.5, BASELINE_R).astype(np.float32)
        base_dt = float("inf")
        for _ in range(6):  # the shared host core throttles unpredictably;
            t0 = time.perf_counter()  # min-of-6 credits the baseline its best
            numpy_two_pass(ub, xb, ORDER)
            base_dt = min(base_dt, time.perf_counter() - t0)
        single_core = BASELINE_R / base_dt
        torch_rate = torch_two_pass_rate(BASELINE_R)
        if torch_rate:
            single_core = max(single_core, torch_rate)
        baseline_impl = "numpy/torch two-pass (measured now)"
    baseline_rate = single_core * BASELINE_CORES

    extras = {}
    roof_path = Path(__file__).parent / "HBM_ROOF.json"
    if roof_path.exists():
        try:
            roof = json.loads(roof_path.read_text())
            roof_gbps = roof.get("roof_sum_f32_gbps")
            if roof_gbps:
                extras["hbm_roof_gbps"] = roof_gbps
                extras["pct_of_roof_f32"] = round(
                    100 * 8 * device_f32 / 1e9 / roof_gbps, 1
                )
        except Exception:
            pass
    # the apparent single-call rate is tunnel-dispatch-bound here (operands
    # are already device-resident); for HOST-fed streams the binding roof is
    # the measured host->device ingest bandwidth (bench_ingest_roof.py) —
    # report it so the device->apparent gap reads as a measured transfer
    # limit, not an anecdote
    ingest_path = Path(__file__).parent / "INGEST_ROOF.json"
    if ingest_path.exists():
        try:
            ing = json.loads(ingest_path.read_text())
            put_gbps = ing.get("roof_put_gbps")
            if put_gbps:
                extras["ingest_roof_put_gbps"] = put_gbps
                extras["ingest_bound_f32_gsps"] = round(put_gbps / 8, 2)
                sf = ing.get("streaming_fan8", {})
                if sf.get("pct_of_put_roof") is not None:
                    extras["streaming_ingest_pct_of_put_roof"] = sf[
                        "pct_of_put_roof"
                    ]
        except Exception:
            pass

    print(
        json.dumps(
            {
                "metric": "order6_central_comoment_reduction_throughput",
                "value": round(device_bf16 / 1e9, 4),
                "unit": "Gsamples/s",
                "vs_baseline": round(device_bf16 / baseline_rate, 2),
                "device_f32_gsps": round(device_f32 / 1e9, 4),
                "apparent_1e8_bf16_gsps": round(apparent_bf16 / 1e9, 4),
                "apparent_1e8_f32_gsps": round(apparent_f32 / 1e9, 4),
                "baseline_single_core_gsps": round(single_core / 1e9, 4),
                "baseline_impl": baseline_impl,
                "baseline_projection_cores": BASELINE_CORES,
                **extras,
                "note": (
                    "value = bf16 device rate from K-chained in-jit "
                    "timing (removes fixed+noisy tunnel dispatch overhead); "
                    "baseline = measured single-core COMPILED rate "
                    "(BASELINE.json.published, native C++ fused single-pass "
                    "= the cmomy/numba stand-in) x64 cores assumed linear; "
                    "pct_of_roof_f32 = f32 stream rate / measured chip read "
                    "bandwidth (bench_hbm_roof.py)"
                ),
            }
        )
    )


def _watchdog(budget_s: float = 2700.0) -> None:
    """Emit the contract JSON line and exit if the run wedges.

    A killed TPU process can wedge the chip claim for a long time
    (observed: hours); the very first device op then blocks inside
    backend init with no exception to catch.  The daemon thread turns an
    infinite hang into a recorded failure; on a normal run the process
    exits long before the budget and the thread dies with it.
    """
    import os
    import sys
    import threading

    def fire():
        time.sleep(budget_s)
        print(
            json.dumps(
                {
                    "metric": "order6_central_comoment_reduction_throughput",
                    "value": 0.0,
                    "unit": "Gsamples/s",
                    "vs_baseline": 0.0,
                    "error": (
                        f"watchdog: no result within {budget_s:.0f}s — "
                        "TPU chip claim unavailable/wedged"
                    ),
                }
            ),
            flush=True,
        )
        os._exit(2)

    threading.Thread(target=fire, daemon=True).start()


if __name__ == "__main__":
    _watchdog()
    main()
