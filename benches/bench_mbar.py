"""MBAR at serving scale: hybrid solve + batched reweighting throughput.

Reference role: ``pymbar.MBAR`` inside ``MBARModel``
(/root/reference/src/thermoextrap/models.py:1049-1111) — a CPU
numpy/scipy solver.  Here the whole thing is one jitted program: the
Newton/self-consistent hybrid iterates inside a ``lax.while_loop`` (each
iteration streams the (K, N) reduced-potential matrix from HBM a few
times + one (K,N)@(N,K) MXU Hessian matmul), and target expectations
stream α-chunks so the (A, N) weight matrix never materializes.

Sizes: K=4 sampled states, N=1e8 pooled samples (f32, 1.6 GB u_kn),
A=256 reweighting targets — production free-energy-surface traffic.

Timing: warm wall-clock, scalar-fetch sync, best of REPEATS (apparent
single-call latency incl. the fixed ~5 ms tunnel dispatch — the honest
serving quantity; the solve runs 100+ ms so dispatch is <5%).
Baseline: the SAME hybrid algorithm in single-core numpy at N=1e6,
cost-per-iteration scaled linearly to N=1e8 (logsumexp streams scale
linearly; gives numpy the benefit of ignoring its cache falloff).

Writes BENCH_MBAR.json.  Usage: python benches/bench_mbar.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

REPEATS = 3


def _numpy_hybrid_per_iter(k: int, n: int, iters: int = 4) -> float:
    """Seconds per hybrid iteration, single-core numpy (same math)."""
    import numpy as np

    rng = np.random.default_rng(0)
    sig = np.linspace(1.0, 3.0, k)
    xs = rng.normal(0.0, 1.5, size=n).astype(np.float32)
    u_kn = (xs[None, :] ** 2 / (2.0 * sig[:, None] ** 2)).astype(np.float32)
    log_n_k = np.log(np.full(k, float(n // k), dtype=np.float64))
    f = np.zeros(k)

    def logsumexp(a, axis):
        m = a.max(axis=axis, keepdims=True)
        return (m + np.log(np.exp(a - m).sum(axis=axis, keepdims=True))).squeeze(axis)

    t0 = time.perf_counter()
    for _ in range(iters):
        log_denom = logsumexp((log_n_k + f)[:, None] - u_kn, axis=0)
        logw = f[:, None] - u_kn - log_denom[None, :]
        w = np.exp(logw)
        s = w.sum(axis=1)
        h = np.diag(s) - w @ w.T  # N_k factors folded, shape-level cost only
        g = s - 1.0
        f = f - np.linalg.solve(h + 1e-12 * np.eye(k), g)
        f = f - f[0]
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from thermoextrap_tpu.models.mbar import (
        mbar_expectations_alphas,
        mbar_solve_info,
    )
    from thermoextrap_tpu.utils import enable_compilation_cache

    # fresh compiles through the remote axon service run 1-5 min per
    # program (COMPILE_CACHE.json); persist them across bench runs
    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    on_accel = jax.default_backend() != "cpu"
    n = 100_000_000 if on_accel and not args.quick else 1_000_000
    k, a_targets = 4, 256

    # K harmonic states, pooled: u_kn built on device (no host transfer)
    sig = jnp.linspace(1.0, 3.0, k, dtype=jnp.float32)

    @jax.jit
    def make_data(key):
        # samples drawn per state, concatenated — matches the MBAR layout
        keys = jax.random.split(key, k)
        xs = jnp.concatenate(
            [
                s * jax.random.normal(kk, (n // k,), dtype=jnp.float32)
                for s, kk in zip(sig, keys)
            ]
        )
        u_kn = xs[None, :] ** 2 / (2.0 * sig[:, None] ** 2)
        return u_kn, xs

    print(f"# generating N={n} on {jax.default_backend()}...", file=sys.stderr, flush=True)
    u_kn, xs = make_data(jax.random.key(0))
    n_k = jnp.full((k,), float(n // k), dtype=jnp.float32)
    float(u_kn[0, 0])  # materialize before timing
    print("# data ready; compiling solve...", file=sys.stderr, flush=True)

    def timed(fn, sync):
        sync(fn())  # compile + warm
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best, out

    results = {"K": k, "N": n, "A": a_targets, "backend": jax.default_backend()}

    # --- hybrid solve ---
    solve = jax.jit(lambda: mbar_solve_info(u_kn, n_k, tol=1e-5))
    t_solve, (f_k, it, res) = timed(solve, lambda o: float(o[0][1]))
    print(f"# solve done: {t_solve:.3f}s; compiling expectations...", file=sys.stderr, flush=True)
    it = int(it)
    results["solve_hybrid"] = {
        "wallclock_s": round(t_solve, 4),
        "iterations": it,
        "residual": float(res),
        "per_iter_ms": round(1e3 * t_solve / max(it, 1), 3),
        "sample_state_rate_gsps": round(n * k * it / t_solve / 1e9, 2),
    }
    assert float(res) <= 1e-5, f"solve did not converge: residual {float(res)}"

    # --- analytic check: f_k = -log(sig_k/sig_0) ---
    import numpy as np

    f_exact = -np.log(np.asarray(sig) / float(sig[0]))
    err = float(np.max(np.abs(np.asarray(f_k) - f_exact)))
    results["solve_hybrid"]["max_abs_err_vs_analytic"] = round(err, 6)
    assert err < 5e-3, f"free energies off by {err}"

    # --- batched reweighting: <x^2> at A linear-in-alpha targets ---
    alphas = jnp.linspace(0.3, 1.5, a_targets, dtype=jnp.float32)
    u_base = u_kn[0]  # alpha * u_0 family
    x_n = (xs**2)[:, None]
    expect = jax.jit(
        lambda: mbar_expectations_alphas(
            u_kn, n_k, f_k, alphas, u_base, x_n, chunk=8
        )
    )
    t_exp, out = timed(expect, lambda o: float(o[0, 0]))
    print(f"# expectations done: {t_exp:.3f}s; numpy baseline...", file=sys.stderr, flush=True)
    results["expectations_alphas"] = {
        "wallclock_s": round(t_exp, 4),
        "target_sample_rate_gsps": round(a_targets * n / t_exp / 1e9, 2),
        "targets_per_s": round(a_targets / t_exp, 1),
    }
    assert bool(jnp.all(jnp.isfinite(out))), "non-finite expectations"

    # --- single-core numpy baseline (same algorithm), linear projection ---
    n_base = min(n, 1_000_000)
    per_iter_np = _numpy_hybrid_per_iter(k, n_base)
    t_np_proj = per_iter_np * (n / n_base) * it
    results["baseline_numpy_1core"] = {
        "per_iter_s_at_1e6": round(per_iter_np, 4),
        "projected_solve_s_at_N": round(t_np_proj, 2),
        "speedup_solve": round(t_np_proj / t_solve, 1),
    }

    out_path = Path(__file__).parent.parent / "BENCH_MBAR.json"
    out_path.write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
