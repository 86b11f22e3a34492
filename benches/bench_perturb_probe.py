"""Micro-probes for the two unexplained perturb costs (round 5):

1. pred: the (A, R)-layout fused reduce measured 27 ms where roofline is
   ~1 ms — probe a per-target 1-D formulation (A separate fused reduces
   over (R,) arrays, shift from u_min/u_max monotonicity).
2. kernel: 3.4 us/dot vs the flat moment kernel's proven 0.93 us — probe
   na-scaling (na=1 vs na=5 at fixed everything else); if per-dot time
   scales with na the contrib build/concat is VPU-bound, if flat it is
   structural overhead.

Appends to PERTURB_DECOMP.json.  Run: python benches/bench_perturb_probe.py
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
REPEATS = 3
OUT = Path(__file__).parent.parent / "PERTURB_DECOMP.json"

results = json.loads(OUT.read_text()) if OUT.exists() else {}


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
    from thermoextrap_tpu.ops.moments_pallas import resample_perturb_poisson
    from thermoextrap_tpu.pipeline import _perturb_predict, _perturb_weights

    key = jax.random.key(0)
    ku, kx = jax.random.split(key)
    uv = jax.block_until_ready(3.0 + jax.random.normal(ku, (R,), dtype=jnp.float32))
    xv = jax.block_until_ready(
        1.0 + 0.5 * jax.random.normal(kx, (R, 1), dtype=jnp.float32)
    )
    dalpha_np = np.linspace(-0.2, 0.2, A).astype(np.float32)
    dalpha = jnp.asarray(dalpha_np)

    # -- probe 1: per-target 1-D pred (no (A, R) intermediate at all) -------
    @jax.jit
    def pred_1d(u, x):
        x0 = x[:, 0]
        umin = u.min()
        umax = u.max()
        nums, dens = [], []
        for a in range(A):
            da = dalpha[a]
            sh = jnp.where(da > 0, -da * umin, -da * umax)
            e = jnp.exp(-da * u - sh)
            nums.append((e * x0).sum())
            dens.append(e.sum())
        return jnp.stack(nums) / jnp.stack(dens)

    t = best_of(lambda: pred_1d(uv, xv))
    record("probe_pred_1d_s", round(t, 4))
    # correctness vs the production predict
    p1 = np.asarray(pred_1d(uv, xv), np.float64)
    e = _perturb_weights(uv, dalpha, None)
    p0 = np.asarray(_perturb_predict(e, xv), np.float64)[:, 0]
    record(
        "probe_pred_1d_max_rel_vs_prod",
        float(np.max(np.abs(p1 - p0) / np.maximum(np.abs(p0), 1e-30))),
    )

    # -- probe 2: kernel na-scaling (same R, nrep, grid) --------------------
    e5 = jax.block_until_ready(jnp.asarray(np.asarray(e, np.float32)))

    @jax.jit
    def kern_na5(ee, x, s):
        return resample_perturb_poisson(ee, x, NREP, seed=s)

    t5 = best_of(lambda: kern_na5(e5, xv, jnp.int32(1)))
    record("probe_kernel_na5_s", round(t5, 4))

    e1 = jax.block_until_ready(e5[:1])

    @jax.jit
    def kern_na1(ee, x, s):
        return resample_perturb_poisson(ee, x, NREP, seed=s)

    t1 = best_of(lambda: kern_na1(e1, xv, jnp.int32(1)))
    record("probe_kernel_na1_s", round(t1, 4))
    record("probe_kernel_na_scaling_ratio", round(t5 / t1, 2))


if __name__ == "__main__":
    main()
