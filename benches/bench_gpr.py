"""GPR fit wall-clock benchmark (the second BASELINE.md headline).

Fits the heteroscedastic derivative GPR on IG states (orders 0..4 at
several state points, bootstrap noise covariance) and reports the
end-to-end fit time — the workload the reference runs through GPflow/TF
L-BFGS (active_utils.py:802-869, gp_models.py:1076-1156).

Three numbers matter:
- ``fit_cold_s``: first fit, includes jit compilation of the LML/grad.
- ``fit_warm_s``: a FRESH model on fresh data with the same structure
  (the active-learning iteration pattern) — compiled cores are cached at
  module level, so this is pure optimization time.
- ``predict_warm_s``: posterior on a 1000-point grid after compile.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def _stage(states):
    from scipy import linalg

    from thermoextrap_tpu.gpr_active import active_utils as au

    xs, ys, covs = [], [], []
    for s in states:
        x, y, c = au.input_GP_from_state(s, n_rep=100)
        xs.append(x)
        ys.append(y)
        covs.append(c)
    x_data = np.vstack(xs)
    y_data = np.vstack(ys)
    noise = np.array(
        [linalg.block_diag(*[c[k] for c in covs]) for k in range(y_data.shape[1])]
    )
    return x_data, y_data, noise


def main() -> None:
    # --cache DIR: enable the persistent compilation cache (measured 81x
    # on cold staging through the axon compile service, COMPILE_CACHE.json)
    if "--cache" in sys.argv:
        from thermoextrap_tpu.utils.compile_cache import (
            enable_compilation_cache,
        )

        enable_compilation_cache(sys.argv[sys.argv.index("--cache") + 1])

    from thermoextrap_tpu.gpr_active import active_utils as au
    from thermoextrap_tpu.gpr_active.ig_active import extrap_IG

    betas = [0.5, 1.0, 1.5, 2.0, 2.5]

    def make_states(seed0):
        return [
            extrap_IG(b, rng=seed0 + i, nconfig=10_000, npart=1_000, order=4)
            for i, b in enumerate(betas)
        ]

    t0 = time.perf_counter()
    data_a = _stage(make_states(0))
    t_stage = time.perf_counter() - t0
    # warm staging: same shapes -> all reduction/bootstrap kernels already
    # compiled; this is what an active-learning iteration actually pays
    t0 = time.perf_counter()
    data_b = _stage(make_states(100))
    t_stage_warm = time.perf_counter() - t0

    # cold: includes jit compile of the (N=25, Dy=1) LML + grad
    t0 = time.perf_counter()
    gpr = au.create_base_GP_model(data_a)
    res = gpr.train()
    t_cold = time.perf_counter() - t0

    # warm: fresh model + fresh data, same structure -> compiled-core reuse
    # (this is what every active-learning iteration pays)
    t0 = time.perf_counter()
    gpr2 = au.create_base_GP_model(data_b)
    res2 = gpr2.train()
    t_warm = time.perf_counter() - t0

    grid = np.stack([np.linspace(0.5, 2.5, 1000), np.zeros(1000)], axis=1)
    t0 = time.perf_counter()
    mu, var = gpr2.predict_f(grid)
    float(np.asarray(mu)[0, 0])
    t_pred_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    mu, var = gpr.predict_f(grid)
    float(np.asarray(mu)[0, 0])
    t_pred_warm = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "derivative_gpr_fit_wallclock",
                "value": round(t_warm, 3),
                "unit": "s",
                "fit_cold_s": round(t_cold, 3),
                "fit_warm_s": round(t_warm, 3),
                "predict_cold_s": round(t_pred_cold, 3),
                "predict_warm_s": round(t_pred_warm, 3),
                "staging_cold_s": round(t_stage, 3),
                "staging_warm_s": round(t_stage_warm, 3),
                "n_points": int(data_a[0].shape[0]),
                "lbfgs_iters": [int(res.nit), int(res2.nit)],
                "final_nll": [round(float(res.fun), 3), round(float(res2.fun), 3)],
            }
        )
    )


if __name__ == "__main__":
    main()
