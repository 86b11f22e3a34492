"""Host-side bench: native C++ moments engine vs a numpy two-pass reduction.

Measures the eager-ingest role (constructor-time reductions over numpy
trajectories — the cmomy/numba role in the reference stack).  Pure host
CPU; never touches the TPU chip.  Writes BENCH_NATIVE.json.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


def numpy_reduce_central(uv, xv, order, w):
    """Two-pass numpy reference (same algorithm as ops/moments.py)."""
    wsum = w.sum()
    uave = (w * uv).sum() / wsum
    xave = (w[:, None] * xv).sum(0) / wsum
    du_v = uv - uave
    dx_v = xv - xave
    powers = np.empty((uv.shape[0], order + 1))
    powers[:, 0] = w
    for n in range(order):
        powers[:, n + 1] = powers[:, n] * du_v
    du = powers.sum(0) / wsum
    dxdu = powers.T @ dx_v / wsum
    return xave, uave, du, dxdu


def best_of(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    # keep everything off the TPU chip even on a host without g++: the
    # XLA fallback would otherwise run eager ops on the forced "axon,cpu"
    # platform (sitecustomize overrides env-var steering; only an
    # in-process config update works — see CLAUDE.md gotchas)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from thermoextrap_tpu import native

    rng = np.random.default_rng(0)
    R, order = 4_000_000, 6
    uv = rng.normal(3.0, 1.0, R)
    xv = rng.normal(0.0, 1.0, (R, 1))
    w = rng.uniform(0.5, 1.5, R)

    # correctness cross-check before timing
    got = native.reduce_central_comoments(uv, xv, order, weight=w)
    want = numpy_reduce_central(uv, xv, order, w)
    for g, e in zip(got, want):
        # atol: the engine pins du[1]=0 / dxdu[0]=0 exactly; numpy leaves
        # ~1e-16 centering residue there
        np.testing.assert_allclose(
            np.asarray(g).squeeze(), np.asarray(e).squeeze(), rtol=1e-10, atol=1e-13
        )

    t_native = best_of(lambda: native.reduce_central_comoments(uv, xv, order, weight=w))
    t_numpy = best_of(lambda: numpy_reduce_central(uv, xv, order, w))

    nrep = 32
    freq = rng.poisson(1.0, (nrep, 500_000)).astype(np.float64)
    uvs, xvs, ws = uv[:500_000], xv[:500_000], w[:500_000]
    t_boot = best_of(
        lambda: native.resample_central_comoments(uvs, xvs, freq, order, weight=ws), n=3
    )

    out = {
        "available": native.available(),
        "R": R,
        "order": order,
        "reduce_native_s": round(t_native, 4),
        "reduce_numpy_s": round(t_numpy, 4),
        "reduce_native_gsps": round(R / t_native / 1e9, 3),
        "speedup_vs_numpy": round(t_numpy / t_native, 2),
        "bootstrap_rep_samples_gsps": round(nrep * 500_000 / t_boot / 1e9, 3),
    }
    Path("BENCH_NATIVE.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
