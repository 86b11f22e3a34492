"""Bootstrap kernel benchmarks (secondary to the headline bench.py).

Measures the fused freq-matmul bootstrap and the in-kernel Poisson
bootstrap at several (R, nrep) scales.  Prints one JSON line per config.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import time

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def main() -> None:
    from thermoextrap_tpu.ops.moments_pallas import (
        resample_central_comoments_fused,
        resample_central_comoments_poisson,
    )
    from thermoextrap_tpu.ops.resample import freq_from_indices, random_indices

    order = 6
    key = jax.random.key(0)

    # freq-matmul needs the (nrep, R) table in HBM; beyond ~2e9 entries the
    # in-kernel Poisson path is the only option (that's its point)
    for r, nrep in [(1_000_000, 256)]:
        k1, k2, k3 = jax.random.split(jax.random.key(r), 3)
        uv = 5.0 + jax.random.normal(k1, (r,), dtype=jnp.float32)
        xv = 2.0 + 0.5 * jax.random.normal(k2, (r,), dtype=jnp.float32)

        freq = freq_from_indices(random_indices(k3, nrep, r), r)
        out = resample_central_comoments_fused(uv, xv, freq, order)
        sync(out[1])
        t0 = time.perf_counter()
        out = resample_central_comoments_fused(uv, xv, freq, order)
        sync(out[1])
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"bootstrap_freq_matmul_R{r}_nrep{nrep}",
            "value": round(nrep * r / dt / 1e12, 3),
            "unit": "Trep-samples/s",
        }))

        out = resample_central_comoments_poisson(uv, xv, nrep, order, seed=1)
        sync(out[1])
        t0 = time.perf_counter()
        out = resample_central_comoments_poisson(uv, xv, nrep, order, seed=2)
        sync(out[1])
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"bootstrap_poisson_inkernel_R{r}_nrep{nrep}",
            "value": round(nrep * r / dt / 1e12, 3),
            "unit": "Trep-samples/s",
        }))

    # Poisson at scales where the freq table does not fit in HBM at all
    for r, nrep in [(10_000_000, 256), (100_000_000, 256)]:
        k1, k2 = jax.random.split(jax.random.key(r))
        uv = 5.0 + jax.random.normal(k1, (r,), dtype=jnp.float32)
        xv = 2.0 + 0.5 * jax.random.normal(k2, (r,), dtype=jnp.float32)
        out = resample_central_comoments_poisson(uv, xv, nrep, order, seed=1)
        sync(out[1])
        t0 = time.perf_counter()
        out = resample_central_comoments_poisson(uv, xv, nrep, order, seed=2)
        sync(out[1])
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"bootstrap_poisson_inkernel_R{r}_nrep{nrep}",
            "value": round(nrep * r / dt / 1e12, 3),
            "unit": "Trep-samples/s",
        }))

if __name__ == "__main__":
    main()
