"""GPR fit wall-clock benchmark (the second BASELINE.md headline).

Fits the heteroscedastic derivative GPR on IG states (orders 0..4 at
several state points, bootstrap noise covariance) and reports the
end-to-end fit time — the workload the reference runs through GPflow/TF
L-BFGS (active_utils.py:802-869).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import time

import numpy as np


def main() -> None:
    from thermoextrap_tpu.gpr_active import active_utils as au
    from thermoextrap_tpu.gpr_active.ig_active import extrap_IG

    betas = [0.5, 1.0, 1.5, 2.0, 2.5]
    states = [
        extrap_IG(b, rng=i, nconfig=10_000, npart=1_000, order=4)
        for i, b in enumerate(betas)
    ]

    # staging (bootstrap covariances) timed separately from the fit
    t0 = time.perf_counter()
    xs, ys, covs = [], [], []
    for s in states:
        x, y, c = au.input_GP_from_state(s, n_rep=100)
        xs.append(x)
        ys.append(y)
        covs.append(c)
    t_stage = time.perf_counter() - t0

    from scipy import linalg

    x_data = np.vstack(xs)
    y_data = np.vstack(ys)
    noise = np.array(
        [linalg.block_diag(*[c[k] for c in covs]) for k in range(y_data.shape[1])]
    )

    t0 = time.perf_counter()
    gpr = au.create_base_GP_model((x_data, y_data, noise))
    res = gpr.train()
    t_fit = time.perf_counter() - t0

    print(json.dumps({
        "metric": "derivative_gpr_fit_wallclock",
        "value": round(t_fit, 3),
        "unit": "s",
        "staging_s": round(t_stage, 3),
        "n_points": int(x_data.shape[0]),
        "lbfgs_iters": int(res.nit),
        "final_nll": round(float(res.fun), 3),
    }))


if __name__ == "__main__":
    main()
