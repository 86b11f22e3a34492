"""Focused follow-up to bench_perturb_decomp.py: ONLY the stages the v2
run did not capture (post partial-sums rewrite) — kernel gates, the
device-PRNG kernel, and the end-to-end pipeline rows.  Merges into
PERTURB_DECOMP.json.  5 compiles total (the full decomp died twice to
compile-queue stalls).

Run: python benches/bench_perturb_focus.py
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
OUT = Path(__file__).parent.parent / "PERTURB_DECOMP.json"

results = json.loads(OUT.read_text()) if OUT.exists() else {}
results.update({"backend": jax.default_backend(), "R": R, "nrep": NREP, "targets": A})


def record(k, v):
    results[k] = v
    OUT.write_text(json.dumps(results, indent=2))
    print(json.dumps({k: v}), flush=True)


def sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        _ = float(jnp.asarray(leaf).ravel()[0])
    return out


def best_of(fn):
    sync(fn())
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
        _perturb_weights,
        make_perturb_pipeline,
    )

    key = jax.random.key(0)
    ku, kx = jax.random.split(key)
    uv = jax.block_until_ready(3.0 + jax.random.normal(ku, (R,), dtype=jnp.float32))
    xv = jax.block_until_ready(
        1.0 + 0.5 * jax.random.normal(kx, (R, 1), dtype=jnp.float32)
    )
    betas = jnp.asarray([1.8, 1.9, 2.0, 2.1, 2.2], jnp.float32)
    dalpha = betas - BETA0
    rep_total = A * NREP * R

    # new predict path (fused reduce, no degenerate matmul)
    from thermoextrap_tpu.pipeline import _perturb_predict

    @jax.jit
    def pred_only(u, x):
        e = _perturb_weights(u, dalpha, None)
        return _perturb_predict(e, x)

    t = best_of(lambda: pred_only(uv, xv))
    record("pred_only_reduce_s", round(t, 4))

    # ONE program: draw i8 table + einsum sums + kernel sums (both consume
    # the SAME streamed e rows)
    @jax.jit
    def both(u, x, s):
        e = _perturb_weights(u, dalpha, None)
        freq = poisson1_freq(jax.random.key(s), (NREP, R), dtype=jnp.int8)
        s_k = resample_perturb_freq(e, x, freq)
        b_e = _perturb_boot(e, x, freq.astype(u.dtype))  # (A, nrep, V)
        return s_k, b_e

    s_k, b_e = sync(both(uv, xv, jnp.int32(1)))
    p_k = np.asarray(s_k, np.float64)
    p_k = p_k[..., :1] / p_k[..., 1:]
    p_e = np.asarray(b_e, np.float64)
    rel = np.max(np.abs(p_k - p_e) / np.maximum(np.abs(p_e), 1e-30))
    record("gate_kernel_vs_einsum_max_rel_v3", float(rel))

    # ground truth: host-f64 replicate predictions on the SAME table —
    # adjudicates WHICH device path carries the 3e-4 (deterministic,
    # R-grown) divergence the v2/v3 runs measured
    freq_h = np.asarray(
        jax.device_get(
            jax.jit(
                lambda s: poisson1_freq(
                    jax.random.key(s), (NREP, R), dtype=jnp.int8
                )
            )(jnp.int32(1))
        ),
        np.float64,
    )
    u_h = np.asarray(uv, np.float64)
    x_h = np.asarray(xv, np.float64)
    logw = -np.asarray(dalpha, np.float64)[:, None] * u_h[None, :]
    e_h = np.exp(logw - logw.max(axis=1, keepdims=True))
    num = np.einsum("nr,ar,rv->anv", freq_h, e_h, x_h)
    den = freq_h @ e_h.T  # (nrep, A)
    p_h = num / den.T[:, :, None]
    rel_k = np.max(np.abs(p_k - p_h) / np.maximum(np.abs(p_h), 1e-30))
    rel_e = np.max(np.abs(p_e - p_h) / np.maximum(np.abs(p_h), 1e-30))
    record("gate_kernel_vs_hostf64_max_rel", float(rel_k))
    record("gate_einsum_vs_hostf64_max_rel", float(rel_e))

    # device-PRNG kernel: full bootstrap, no table (e build included)
    @jax.jit
    def kernel_device(u, x, s):
        e = _perturb_weights(u, dalpha, None)
        return resample_perturb_poisson(e, x, NREP, seed=s)

    t = best_of(lambda: kernel_device(uv, xv, jnp.int32(1)))
    record("kernel_device_full_s", round(t, 4))
    record("kernel_device_grep_samples_per_s", round(rep_total / t / 1e9, 1))

    # gate: dalpha=0 (e = ones) == the flat moment kernel's replicate means
    @jax.jit
    def pair_da0(u, x):
        s0 = resample_perturb_poisson(jnp.ones((1, R), jnp.float32), x, NREP, seed=7)
        xave_r = resample_central_comoments_poisson(u, x, NREP, 1, seed=7)[0]
        return s0, xave_r

    s0, xave_r = sync(pair_da0(uv, xv))
    s0 = np.asarray(s0, np.float64)
    pred0 = s0[0, :, 0] / s0[0, :, 1]
    xr = np.asarray(xave_r)[:, 0]
    rel0 = np.max(np.abs(pred0 - xr) / np.maximum(np.abs(xr), 1e-30))
    record("gate_da0_vs_moment_kernel_max_rel", float(rel0))
    assert rel0 < 1e-5, f"dalpha=0 equality gate failed: {rel0}"

    # end to end, both modes
    for mode in ("table", "device"):
        run = make_perturb_pipeline(BETA0, nrep=NREP, poisson=mode)
        t = best_of(lambda: run(uv, xv, betas))
        record(
            f"pipeline_{mode}_predict_ci",
            {
                "wallclock_s": round(t, 4),
                "grep_samples_per_s": round(rep_total / t / 1e9, 1),
                "bench_pipeline_units_greps": round(NREP * R / t / 1e9, 1),
            },
        )


if __name__ == "__main__":
    main()
