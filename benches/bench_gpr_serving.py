"""On-chip throughput of the frozen GPR serving predictor.

Freezes a realistic derivative GPR (8 training locations x orders 0..6 =
56 rows, the shape an order-6 active-learning fit produces) and measures
posterior (mean, var) queries/s on the device at f32, K-chain differenced
(utils.timing.kchain_time).  Also times the host predict_f path at the
same query count for the serving-role comparison (the reference serves
through its training graph on CPU; reference gpr_active/gp_models.py:
1040-1156).

Writes GPR_SERVING.json.
"""

import json
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def main():
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from thermoextrap_tpu.gpr_active.gp_models import HeteroscedasticGPR
    from thermoextrap_tpu.gpr_active.kernels import RBFDerivKernel
    from thermoextrap_tpu.gpr_active.serving import freeze_predictor
    from thermoextrap_tpu.utils.timing import kchain_time

    rng = np.random.default_rng(0)
    xs = np.linspace(0.0, 2.0, 8)
    order = 6
    X = np.concatenate(
        [np.stack([xs, np.full_like(xs, o)], 1) for o in range(order + 1)]
    )
    n = X.shape[0]
    Y = rng.normal(size=(n, 1))
    cov = np.diag(np.exp(rng.normal(size=n)) * 1e-3)
    model = HeteroscedasticGPR((X, Y, cov), kernel=RBFDerivKernel())

    pred = freeze_predictor(model)  # f32
    # M large enough that the K-chain difference is well above the ~25 ms
    # tunnel noise floor (CLAUDE.md timing methodology)
    m_queries = 1 << 21
    locs = jnp.asarray(
        rng.uniform(0.0, 2.0, size=(m_queries, 1)), jnp.float32
    )

    def step(locs):
        mean, var = pred.predict_fn(locs)
        # data dependency for the fori_loop carry without changing the
        # work: 1e-30 * O(1) additions are exact no-ops in f32 but not
        # removable by the compiler
        bump = (mean.sum(axis=1, keepdims=True) + var.sum(axis=1, keepdims=True))
        return locs + 1e-30 * bump

    sec, _ = kchain_time(step, (locs,), k_lo=4, k_hi=64)
    qps = m_queries / sec

    # host predict_f at the same M (compiled, warm): the training-graph
    # serving path this replaces
    Xt = np.concatenate([np.asarray(locs), np.zeros((m_queries, 1))], axis=1)
    mean_h, var_h = model.predict_f(Xt)  # warm the compile
    t0 = time.perf_counter()
    mean_h, var_h = model.predict_f(Xt)
    _ = float(np.asarray(mean_h)[0, 0]) + float(np.asarray(var_h)[0, 0])
    host_s = time.perf_counter() - t0

    # correctness spot check vs host f64
    mean_d, var_d = pred(np.asarray(locs)[:256])
    np.testing.assert_allclose(
        np.asarray(mean_d), np.asarray(mean_h)[:256], rtol=1e-3, atol=1e-4
    )

    out = {
        "metric": "gpr_serving_queries_per_s",
        "n_train": int(n),
        "m_queries": int(m_queries),
        "device_s_per_call": sec,
        "value": qps,
        "unit": "queries/s",
        "host_predict_f_s": host_s,
        "host_queries_per_s": m_queries / host_s,
        "speedup_vs_host_path": (m_queries / sec) / (m_queries / host_s),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    Path(__file__).parent.parent.joinpath("GPR_SERVING.json").write_text(
        json.dumps(out, indent=1)
    )


if __name__ == "__main__":
    main()
