"""f32 on-chip GPR TRAINING experiment (win or documented negative).

The production fit pins its linear algebra to host CPU f64
(``gp_models._compute_ctx``): the derivative-kernel Gram matrices are
severely ill-conditioned and the TPU has no f64 Cholesky.  The serving
path showed the whitened form ``k** - ||L^-1 k*||^2`` holds f32 error to
``eps * sqrt(cond)`` instead of ``eps * cond`` (gpr_active/serving.py) —
which predicts f32 on-chip TRAINING should be testable on
well-conditioned problems.  This bench runs that experiment instead of
resting on the conditioning argument (VERDICT r3 weak #5):

1. host-f64 reference fit (the production path) on the bench_gpr
   workload (5 ideal-gas states, order-truncated derivative inputs);
2. plain f32 fit on the TPU backend — the SAME jitted neg-LML/grad
   tracer, handed f32 device-resident data;
3. Jacobi-whitened f32 fit on the TPU backend — identical math through
   a unit-diagonal Cholesky: ``W = D^-1 (K+S) D^-1`` with
   ``D = sqrt(diag(K+S))``, ``log|K+S| = log|W| + 2 sum log D``,
   quad form via ``L_W^-1 (D^-1 err)``.  Diagonal scaling is the
   textbook near-optimal symmetric preconditioner, and it is exactly
   the transform that made the f32 serving path safe.

Reported per variant: converged NLL gap vs f64, hyperparameter deltas,
L-BFGS iterations, NaN-guard activations (f32 Cholesky failures), and
per-iteration wall-clock.  Verdict field says whether on-chip f32
training is usable (gap below statistical noise) or measured-negative.

Writes F32_TRAIN_EXPERIMENT.json.  Usage: python benches/bench_f32_train.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def _stage():
    from scipy import linalg

    from thermoextrap_tpu.gpr_active import active_utils as au
    from thermoextrap_tpu.gpr_active.ig_active import extrap_IG

    betas = [0.5, 1.0, 1.5, 2.0, 2.5]
    states = [
        extrap_IG(b, rng=i, nconfig=10_000, npart=1_000, order=4)
        for i, b in enumerate(betas)
    ]
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


def _lbfgs(fun, x0, max_iter=1000):
    from scipy import optimize

    guards = [0]

    def wrapped(x):
        v, g = fun(np.asarray(x, np.float64))
        if not np.isfinite(v) or not np.all(np.isfinite(g)):
            guards[0] += 1
            return 1e12, np.zeros_like(np.asarray(g, np.float64))
        return float(v), np.asarray(g, np.float64)

    t0 = time.perf_counter()
    res = optimize.minimize(
        wrapped, x0, jac=True, method="L-BFGS-B", options={"maxiter": max_iter}
    )
    dt = time.perf_counter() - t0
    return res, dt, guards[0]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from thermoextrap_tpu.gpr_active import active_utils as au
    from thermoextrap_tpu.gpr_active import gp_models as gm

    data = _stage()
    on_accel = jax.default_backend() != "cpu"
    dev = jax.devices()[0]

    # ---- 1. host-f64 reference fit (production path) ----
    model = au.create_base_GP_model(data)
    x0 = np.asarray(model.get_unconstrained(), np.float64)
    t0 = time.perf_counter()
    res64 = model.train()
    t64 = time.perf_counter() - t0
    nll64 = float(res64.fun)
    params64 = dict(model.parameters())

    # conditioning at the f64 optimum (the quantity the whole design
    # decision rests on)
    with gm._compute_ctx():
        fns = model._lml_fns()
        bound = model._bound_args()
        split = gm._build_param_split(model._spec_struct())
        kp, lp = split(jnp.asarray(res64.x), jnp.asarray(bound[0]))
        pvals = [kp[k] for k in tuple(model.kernel.params)]
        ftab = model.kernel.pair_table(model._groups, model._groups)
        k_mat = gm._pair_masked_matrix(
            jnp.asarray(bound[1]), jnp.asarray(bound[2]), model._groups,
            jnp.asarray(bound[1]), jnp.asarray(bound[2]), model._groups,
            pvals, ftab,
        )
        ks = np.asarray(
            k_mat[None]
            + gm._scaled_noise_cov(
                jnp.asarray(bound[4]), jnp.asarray(bound[5]), lp,
                float(model.likelihood.stable_var_min),
            )
        )
    cond = [float(np.linalg.cond(ks[d])) for d in range(ks.shape[0])]
    dvec = np.sqrt(np.einsum("dii->di", ks))
    ks_w = ks / (dvec[:, :, None] * dvec[:, None, :])
    cond_w = [float(np.linalg.cond(ks_w[d])) for d in range(ks_w.shape[0])]

    # ---- 2. plain f32 fit on the device backend ----
    val_and_grad = fns["neg_vag"]

    def cast32(b):
        a = np.asarray(b)
        if a.dtype.kind == "f":
            a = a.astype(np.float32)
        return jax.device_put(a, dev)

    bound32 = tuple(cast32(b) for b in bound)

    def fun32(x):
        v, g = val_and_grad(jnp.asarray(x, jnp.float32), *bound32)
        return float(v), np.asarray(g)

    fun32(x0)  # compile
    res32, t32, guards32 = _lbfgs(fun32, x0)
    n32 = max(res32.nit, 1)

    # ---- 3. Jacobi-whitened f32 fit on the device backend ----
    groups = model._groups
    spec_struct = model._spec_struct()
    svm = float(model.likelihood.stable_var_min)
    kernel = model.kernel
    split = gm._build_param_split(spec_struct)
    ftab = kernel.pair_table(groups, groups)
    porder = tuple(kernel.params)

    def neg_lml_whitened(vec, fixed, locs, gid, y, cov, dplus, mean_x):
        kp, lp = split(vec, fixed)
        pvals = [kp[k] for k in porder]
        k = gm._pair_masked_matrix(locs, gid, groups, locs, gid, groups, pvals, ftab)
        ks = k[None] + gm._scaled_noise_cov(cov, dplus, lp, svm)
        dv = jnp.sqrt(jnp.einsum("dii->di", ks))  # (D, N)
        w = ks / (dv[:, :, None] * dv[:, None, :])
        chol_w = jnp.linalg.cholesky(w)
        err = jnp.moveaxis(y - mean_x, 1, 0)  # (D, N)

        def one(ld, dd, dvd):
            alpha = jax.scipy.linalg.solve_triangular(
                ld, (dd / dvd)[:, None], lower=True
            )[:, 0]
            n = dd.shape[0]
            return (
                -0.5 * jnp.sum(alpha**2)
                - 0.5 * n * jnp.log(2.0 * jnp.pi)
                - jnp.sum(jnp.log(jnp.diagonal(ld)))
                - jnp.sum(jnp.log(dvd))
            )

        return -jnp.sum(jax.vmap(one)(chol_w, err, dv))

    vag_w = jax.jit(jax.value_and_grad(neg_lml_whitened))

    def fun32w(x):
        v, g = vag_w(jnp.asarray(x, jnp.float32), *bound32)
        return float(v), np.asarray(g)

    fun32w(x0)  # compile
    res32w, t32w, guards32w = _lbfgs(fun32w, x0)
    n32w = max(res32w.nit, 1)

    # ---- 3b. LOG-SPACE whitened f32 (representation-safe) ----
    # Diagnosis (F32_TRAIN_EXPERIMENT round-4 first pass): the naive f32
    # casts fail on REPRESENTATION, not conditioning — the order-scaled
    # noise diag exp(2 p dplus + s) reaches ~1e50 at the gpflow-default
    # init, overflowing f32 before any factorization, while the whitened
    # matrix's condition number at the same point is ~7.  So build the
    # whitened operator WITHOUT ever materializing K+S: every factor is
    # an exp of a *difference* of log-scales, all O(1).
    def neg_lml_logwhitened(vec, fixed, locs, gid, y, cov, dplus, mean_x):
        kp, lp = split(vec, fixed)
        pvals = [kp[k] for k in porder]
        k = gm._pair_masked_matrix(locs, gid, groups, locs, gid, groups, pvals, ftab)
        lsc = lp["p"] * dplus + 0.5 * lp["s"]  # (N,) log noise scale
        covd = jnp.einsum("dii->di", cov)  # (D, N)
        # log diag(K + S): logaddexp over the three contributions
        ld = jnp.logaddexp(
            jnp.log(jnp.maximum(jnp.diag(k), 1e-30))[None, :],
            jnp.logaddexp(
                2.0 * lsc[None, :] + jnp.log(jnp.maximum(covd, 1e-30)),
                jnp.log(svm) * jnp.ones_like(covd),
            ),
        )  # (D, N)
        e = jnp.exp(-0.5 * ld)  # (D, N), O(exp(-large)) but multiplies K
        wk = k[None] * e[:, :, None] * e[:, None, :]
        f = jnp.exp(lsc[None, :] - 0.5 * ld)  # noise factor / sqrt(diag)
        ws = cov * f[:, :, None] * f[:, None, :]
        w = wk + ws + (svm * e**2)[:, :, None] * jnp.eye(
            k.shape[0], dtype=k.dtype
        )
        chol_w = jnp.linalg.cholesky(w)
        err = jnp.moveaxis(y - mean_x, 1, 0)  # (D, N)

        def one(lw, dd, ee, ldd):
            alpha = jax.scipy.linalg.solve_triangular(
                lw, (dd * ee)[:, None], lower=True
            )[:, 0]
            n = dd.shape[0]
            return (
                -0.5 * jnp.sum(alpha**2)
                - 0.5 * n * jnp.log(2.0 * jnp.pi)
                - jnp.sum(jnp.log(jnp.diagonal(lw)))
                - 0.5 * jnp.sum(ldd)
            )

        return -jnp.sum(jax.vmap(one)(chol_w, err, e, ld))

    vag_lw = jax.jit(jax.value_and_grad(neg_lml_logwhitened))

    def fun32lw(x):
        v, g = vag_lw(jnp.asarray(x, jnp.float32), *bound32)
        return float(v), np.asarray(g)

    fun32lw(x0)  # compile
    res32lw, t32lw, guards32lw = _lbfgs(fun32lw, x0)
    n32lw = max(res32lw.nit, 1)

    # sanity: whitened f64 == plain f64 identity (host)
    with gm._compute_ctx():
        v_plain = float(val_and_grad(jnp.asarray(res64.x), *bound)[0])
        v_white = float(vag_w(jnp.asarray(res64.x), *(jnp.asarray(b) for b in bound))[0])
        v_logw = float(
            vag_lw(jnp.asarray(res64.x), *(jnp.asarray(b) for b in bound))[0]
        )

    def summarize(res, dt, guards, nit):
        model.set_unconstrained(res.x)
        p = model.parameters()
        dp = {
            k: abs(p[k] - params64[k]) / (abs(params64[k]) + 1e-300)
            for k in params64
        }
        # NLL gap evaluated in the REFERENCE precision at the candidate's
        # parameters: the honest "how good is this optimum" number
        with gm._compute_ctx():
            nll_at = float(val_and_grad(jnp.asarray(res.x, jnp.float64), *bound)[0])
        return {
            "nll_f64_at_solution": round(nll_at, 4),
            "nll_gap_vs_f64": round(nll_at - nll64, 5),
            "iters": int(res.nit),
            "nan_guard_hits": guards,
            "s_per_iter": round(dt / nit, 4),
            "max_rel_param_delta": round(max(dp.values()), 6),
            "param_rel_delta": {k: round(v, 6) for k, v in dp.items()},
        }

    out = {
        "backend": jax.default_backend(),
        "workload": "bench_gpr 5-state ideal-gas, N=25, Dy=1",
        "cond_K_plus_S_at_f64_opt": [round(c, 1) for c in cond],
        "cond_after_jacobi_whitening": [round(c, 1) for c in cond_w],
        "f64_host": {
            "nll": round(nll64, 4),
            "iters": int(res64.nit),
            "wallclock_s": round(t64, 3),
        },
        "whitened_identity_check_f64": round(abs(v_white - v_plain), 8),
        "logwhitened_identity_check_f64": round(abs(v_logw - v_plain), 8),
        "f32_plain_device": summarize(res32, t32, guards32, n32),
        "f32_whitened_device": summarize(res32w, t32w, guards32w, n32w),
        "f32_logwhitened_device": summarize(res32lw, t32lw, guards32lw, n32lw),
    }
    model.set_unconstrained(res64.x)  # leave the model at the f64 optimum

    def ok(key):
        row = out[key]
        return abs(row["nll_gap_vs_f64"]) < 0.5 and row["nan_guard_hits"] == 0

    viable = [k for k in
              ("f32_plain_device", "f32_whitened_device",
               "f32_logwhitened_device") if ok(k)]
    out["verdict"] = (
        f"f32 on-chip training VIABLE via {viable} — the failure mode of "
        "the naive cast is f32 RANGE (noise diag ~1e50 at init), not "
        "conditioning; log-space whitening fixes representation"
        if viable
        else "measured NEGATIVE: f32 on-chip training does not reach the "
        "f64 optimum on this workload even with log-space whitening — "
        "host-f64 pin stands"
    )
    Path(__file__).parent.parent.joinpath("F32_TRAIN_EXPERIMENT.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
