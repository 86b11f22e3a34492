"""Perturbation-bootstrap cost decomposition + fused-kernel gates
(VERDICT r4 item 1) -> PERTURB_DECOMP.json.

The round-4 serving row (`BENCH_PIPELINE.json.perturb_predict_ci` = 19.6
Grep-samples/s) ran the CI as an XLA einsum that re-read a materialized
f32 Poisson table once per target.  This bench isolates each stage at the
bench shape (R=1e7, nrep=128, A=5, V=1) and gates the two fused kernels:

- stages: prediction-only, int8 table draw (poisson1_freq), the OLD
  per-target einsum consume, the table-shared Pallas consume
  (resample_perturb_freq), and the zero-table in-kernel-PRNG variant
  (resample_perturb_poisson)
- end-to-end pipeline rows for poisson="table" and poisson="device"
- equality gates: kernel-vs-einsum sums on the SAME int8 table
  (association-level), and the device kernel at dalpha=0 against the
  flat moment kernel's replicate means at equal seed (shared draw
  schedule, _poisson_draw contract)

Timing: apparent wallclock (best of REPEATS, scalar-fetch sync) — these
are 10-70 ms serving calls where the ~5 ms tunnel dispatch is part of the
honest serving number; the sub-10 ms kernel stages also get a K-chained
device rate (wide 8-vs-64 spread per the CLAUDE.md methodology).

Run on the chip: python benches/bench_perturb_decomp.py [--small]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

SMALL = "--small" in sys.argv
R = 1_000_000 if SMALL else 10_000_000
NREP = 128
A = 5
BETA0 = 2.0
REPEATS = 3
OUT = Path(__file__).parent.parent / "PERTURB_DECOMP.json"

results: dict = {
    "backend": jax.default_backend(),
    "R": R,
    "nrep": NREP,
    "targets": A,
}


def record(k, v):
    results[k] = v
    OUT.write_text(json.dumps(results, indent=2))
    print(json.dumps({k: v}))


def sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        _ = float(jnp.asarray(leaf).ravel()[0])
    return out


def best_of(fn):
    sync(fn())  # warm/compile
    b = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        sync(fn())
        b = min(b, time.perf_counter() - t0)
    return b


def main() -> None:
    from thermoextrap_tpu.ops.moments_pallas import (
        resample_central_comoments_poisson,
        resample_perturb_freq,
        resample_perturb_poisson,
    )
    from thermoextrap_tpu.ops.resample import poisson1_freq
    from thermoextrap_tpu.pipeline import (
        _perturb_boot,
        _perturb_predict,
        _perturb_weights,
        make_perturb_pipeline,
    )

    key = jax.random.key(0)
    ku, kx = jax.random.split(key)
    uv = jax.block_until_ready(
        3.0 + jax.random.normal(ku, (R,), dtype=jnp.float32)
    )
    xv = jax.block_until_ready(
        1.0 + 0.5 * jax.random.normal(kx, (R, 1), dtype=jnp.float32)
    )
    betas = jnp.asarray([1.8, 1.9, 2.0, 2.1, 2.2], jnp.float32)
    dalpha = betas - BETA0
    rep_total = A * NREP * R

    # -- stage: prediction only (e build + (A,R)@(R,V)) ---------------------
    @jax.jit
    def pred_only(u, x):
        e, sh = _perturb_weights(u, dalpha, None, return_shift=True)
        return _perturb_predict(e, x), sh

    t = best_of(lambda: pred_only(uv, xv))
    record("pred_only_s", round(t, 4))
    (_, shift) = pred_only(uv, xv)
    shift = jax.block_until_ready(shift)

    # -- stage: int8 table draw (poisson1_freq) -----------------------------
    draw_i8 = jax.jit(
        lambda s: poisson1_freq(jax.random.key(s), (NREP, R), dtype=jnp.int8)
    )
    t = best_of(lambda: draw_i8(jnp.int32(1)))
    record("table_draw_i8_s", round(t, 4))
    freq8 = jax.block_until_ready(draw_i8(jnp.int32(1)))

    # -- stage: OLD path — f32 table + per-target einsum consume ------------
    @jax.jit
    def old_boot(u, x, s):
        e = _perturb_weights(u, dalpha, None)
        freq = poisson1_freq(jax.random.key(s), (NREP, R), dtype=u.dtype)
        return _perturb_boot(e, x, freq)

    t = best_of(lambda: old_boot(uv, xv, jnp.int32(1)))
    record("old_f32table_einsum_s", round(t, 4))
    record("old_grep_samples_per_s", round(rep_total / t / 1e9, 1))

    # -- stage: einsum consume on the PRE-BUILT int8 table ------------------
    @jax.jit
    def einsum_consume(u, x, f):
        e = _perturb_weights(u, dalpha, None)
        return _perturb_boot(e, x, f.astype(u.dtype))

    t = best_of(lambda: einsum_consume(uv, xv, freq8))
    record("einsum_consume_i8cast_s", round(t, 4))

    # -- stage: fused table-shared kernel consume ---------------------------
    @jax.jit
    def kernel_consume(u, x, f, sh):
        e = _perturb_weights(u, dalpha, None)
        return resample_perturb_freq(e, x, f)

    t = best_of(lambda: kernel_consume(uv, xv, freq8, shift))
    record("kernel_freq_consume_s", round(t, 4))
    s_kern = np.asarray(kernel_consume(uv, xv, freq8, shift), np.float64)
    p_kern = s_kern[..., :1] / s_kern[..., 1:]  # (A, nrep, 1) predictions
    p_eins = np.asarray(einsum_consume(uv, xv, freq8), np.float64)
    rel = np.max(np.abs(p_kern - p_eins) / np.maximum(np.abs(p_eins), 1e-30))
    record("gate_kernel_vs_einsum_max_rel", float(rel))
    # NOT an assert: at R=1e7 BOTH f32 paths carry ~sqrt(R)*eps contraction
    # roundoff (~2e-4); bench_perturb_focus.py adjudicates each against a
    # host-f64 oracle instead of against each other

    # f32 table draw + kernel consume on it: is the int8 stream or the
    # threefry draw the binding cost?
    draw_f32 = jax.jit(
        lambda s: poisson1_freq(
            jax.random.key(s), (NREP, R), dtype=jnp.float32
        )
    )
    t = best_of(lambda: draw_f32(jnp.int32(1)))
    record("table_draw_f32_s", round(t, 4))
    freq32 = jax.block_until_ready(draw_f32(jnp.int32(1)))
    t = best_of(lambda: kernel_consume(uv, xv, freq32, shift))
    record("kernel_freq_consume_f32table_s", round(t, 4))
    freq32.delete()

    # K-chained device rate of the kernel consume
    def chain_time(k):
        @jax.jit
        def _chain(u, x, f, sh, kk):
            def body(_, carry):
                acc, uu, xx, ff, ss = carry
                uu, xx, ff, ss = jax.lax.optimization_barrier((uu, xx, ff, ss))
                ee = _perturb_weights(uu, dalpha, None)
                o = resample_perturb_freq(ee, xx, ff)
                return acc + o[0, 0, 0], uu, xx, ff, ss

            acc, *_ = jax.lax.fori_loop(
                0, kk, body, (jnp.float32(0.0), u, x, f, sh)
            )
            return acc

        float(_chain(uv, xv, freq8, shift, jnp.int32(k)))
        b = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(_chain(uv, xv, freq8, shift, jnp.int32(k)))
            b = min(b, time.perf_counter() - t0)
        return b

    t_lo, t_hi = chain_time(4), chain_time(16)
    dev = rep_total * 12 / max(t_hi - t_lo, 1e-9) / 1e9
    record("kernel_freq_consume_device_greps", round(dev, 1))

    # -- stage: zero-table in-kernel-PRNG variant ---------------------------
    @jax.jit
    def kernel_device(u, x, sh, s):
        e = _perturb_weights(u, dalpha, None)
        return resample_perturb_poisson(e, x, NREP, seed=s)

    t = best_of(lambda: kernel_device(uv, xv, shift, jnp.int32(1)))
    record("kernel_device_full_s", round(t, 4))
    record("kernel_device_grep_samples_per_s", round(rep_total / t / 1e9, 1))

    # -- gate: dalpha=0 == flat moment kernel's replicate means -------------
    da0 = jnp.zeros((1,), jnp.float32)
    sh0 = jnp.zeros((1,), jnp.float32)

    @jax.jit
    def kernel_da0(u, x, s):
        return resample_perturb_poisson(jnp.ones((1, R), jnp.float32), x, NREP, seed=s)

    s0 = np.asarray(kernel_da0(uv, xv, jnp.int32(7)), np.float64)
    pred0 = s0[0, :, 0] / s0[0, :, 1]
    xave_r = np.asarray(
        jax.jit(
            lambda u, x: resample_central_comoments_poisson(
                u, x, NREP, 1, seed=7
            )[0]
        )(uv, xv)
    )[:, 0]
    rel0 = np.max(np.abs(pred0 - xave_r) / np.maximum(np.abs(xave_r), 1e-30))
    record("gate_da0_vs_moment_kernel_max_rel", float(rel0))
    assert rel0 < 1e-5, f"dalpha=0 equality gate failed: {rel0}"

    # -- end to end: the serving pipeline both modes ------------------------
    for mode in ("table", "device"):
        run = make_perturb_pipeline(BETA0, nrep=NREP, poisson=mode)
        t = best_of(lambda: run(uv, xv, betas))
        record(
            f"pipeline_{mode}_predict_ci",
            {
                "wallclock_s": round(t, 4),
                "grep_samples_per_s": round(rep_total / t / 1e9, 1),
            },
        )
        p, sd = run(uv, xv, betas)
        record(
            f"pipeline_{mode}_std_head",
            [round(float(v), 6) for v in np.asarray(sd)[:, 0][:3]],
        )


if __name__ == "__main__":
    main()
