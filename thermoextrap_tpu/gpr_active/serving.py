r"""On-chip serving of trained derivative-informed GPR models.

Training stays on the host in f64 (the derivative-kernel Gram matrices are
ill-conditioned and TPUs have no native f64 Cholesky — see
``gp_models._compute_ctx``), but *posterior prediction* needs no
factorization at all once the training-side solves are frozen.  With

.. math::

    w      &= (K + S)^{-1} (y - m)            \\
    L^{-1} &: \; L L^\top = K + S

precomputed per output dim (tiny: ``N`` ~ tens of training rows), the
posterior at ``M`` query points is

.. math::

    \mu_*      &= k_*^\top w + m_*  \\
    \sigma_*^2 &= k_{**} - \lVert L^{-1} k_* \rVert^2

— one ``(N, M)`` kernel block and two matmuls: pure MXU work at f32.  The
cross block :math:`k_*` is the sympy-lambdified closed-form derivative
kernel evaluated at a STATIC query derivative order, so the whole predictor
jits with static structure and exports shape-polymorphically in ``M``
(:func:`thermoextrap_tpu.serving_export.export_gpr_predictor`).

No reference analogue: the reference serves predictions through the same
TF graph it trains with (reference gpr_active/gp_models.py:1040-1156),
re-running the Cholesky per predict call on the CPU.  Here the model is
trained once and served anywhere — the frozen constants ride inside the
jitted program.

Numerical notes
---------------
- The freeze itself runs under the host-f64 context; only the frozen
  constants are cast to the serving dtype.  With ``dtype=float64`` the
  predictor reproduces :meth:`HeteroscedasticGPR.predict_f` to ~1e-12
  (same whitened math, ``L^{-1}`` folded); the default f32 path is gated
  in tests at ~1e-4 relative (mean) / ~eps·k(x,x) absolute (variance).
- f32 cancellation can drive the posterior variance slightly negative at
  near-interpolated points; the served variance is clamped at 0 (the host
  ``predict_f`` path does not clamp).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .gp_models import (
    ConstantMeanWithDerivs,
    HeteroscedasticGPR,
    HeteroscedasticGPRAnalyticalScale,
    LinearWithDerivs,
    SympyMeanFunc,
    _build_param_split,
    _compute_ctx,
    _pair_masked_matrix,
    _scaled_noise_cov,
)

__all__ = ["FrozenGPRPredictor", "freeze_predictor"]


def _frozen_mean_fn(mean_function, d_new, out_dim, dtype):
    """Traceable specialization of a mean function at a STATIC query
    derivative order ``d_new`` → ``f(locs (M, obs)) -> (M, out_dim)`` of
    actual (unscaled) mean values.

    The generic mean functions inspect concrete derivative-order columns
    (``np.asarray(X)``), so they cannot trace; with the order fixed each
    one collapses to a closed traceable form.
    """
    is_zero = all(d == 0 for d in d_new)

    if mean_function is None:
        def zero(locs):
            return jnp.zeros((locs.shape[0], out_dim), dtype=locs.dtype)

        return zero

    if isinstance(mean_function, ConstantMeanWithDerivs):
        c = (
            jnp.asarray(np.asarray(mean_function.c), dtype)
            if is_zero
            else jnp.zeros((out_dim,), dtype)
        )

        def const(locs):
            return jnp.broadcast_to(c[None, :], (locs.shape[0], out_dim))

        return const

    if isinstance(mean_function, LinearWithDerivs):
        slope = jnp.asarray(np.asarray(mean_function.slope), dtype)
        b = jnp.asarray(np.asarray(mean_function.b), dtype)
        d_arr = np.asarray(d_new, dtype=np.float64)
        is_one = bool(np.any(d_arr == 1.0) and np.all(d_arr < 2.0))

        def linear(locs):
            if is_zero:
                return locs @ slope + b
            if is_one:
                row = jnp.asarray(d_arr, dtype) @ slope
                return jnp.broadcast_to(row[None, :], (locs.shape[0], out_dim))
            return jnp.zeros((locs.shape[0], out_dim), dtype=locs.dtype)

        return linear

    if isinstance(mean_function, SympyMeanFunc):
        fn = mean_function._fn(tuple(int(d) for d in d_new))
        pvals = [
            jnp.asarray(mean_function.param_values[s.name], dtype)
            for s in mean_function.param_syms
        ]

        def sym(locs):
            cols = [locs[:, k] for k in range(locs.shape[1])]
            vals = jnp.broadcast_to(
                jnp.asarray(fn(*cols, *pvals)), (locs.shape[0],)
            )
            return jnp.broadcast_to(vals[:, None], (locs.shape[0], out_dim))

        return sym

    msg = (
        f"cannot freeze mean function {type(mean_function).__name__}: it "
        "inspects concrete derivative-order columns and is not traceable. "
        "Pass mean_new_fn=, a traceable locs (M, obs) -> (M, out_dim) "
        "callable returning the mean at the query derivative order."
    )
    raise TypeError(msg)


class FrozenGPRPredictor:
    """A trained GPR frozen for serving: ``predictor(locs) -> (mean, var)``.

    Built by :func:`freeze_predictor`; holds the precomputed posterior
    weights in the serving dtype plus a jitted predict closure.  ``locs``
    is ``(M, obs_dims)`` (a bare ``(M,)`` is accepted when ``obs_dims==1``);
    outputs are ``(M, out_dim)`` each.

    ``predict_fn`` exposes the raw jittable closure for composition
    (vmap/shard/export).
    """

    def __init__(self, predict_fn, *, meta: dict):
        self.predict_fn = predict_fn
        self._jitted = jax.jit(predict_fn)
        self.meta = dict(meta)

    @property
    def obs_dims(self) -> int:
        return self.meta["obs_dims"]

    def __call__(self, locs):
        locs = jnp.asarray(locs, jnp.dtype(self.meta["dtype"]))
        if locs.ndim == 1:
            if self.obs_dims != 1:
                msg = f"locs must be (M, {self.obs_dims}) for this model"
                raise ValueError(msg)
            locs = locs[:, None]
        if locs.ndim != 2 or locs.shape[1] != self.obs_dims:
            msg = f"locs must be (M, {self.obs_dims}), got {locs.shape}"
            raise ValueError(msg)
        return self._jitted(locs)


def freeze_predictor(
    model,
    d_new=None,
    *,
    dtype=jnp.float32,
    mean_new_fn=None,
) -> FrozenGPRPredictor:
    r"""Freeze a trained :class:`~.gp_models.HeteroscedasticGPR` into a
    device-resident posterior predictor.

    The training-side solves run once on the host in f64 (Cholesky of the
    noisy Gram per output dim); the returned predictor evaluates posterior
    mean and variance from the frozen ``(K+S)^{-1}(y-m)`` /
    ``(K+S)^{-1}`` tensors with pure matmuls — jittable, exportable,
    MXU-friendly at the default ``float32``.

    Parameters
    ----------
    model :
        A (trained) ``HeteroscedasticGPR`` or subclass.  The
        ``HeteroscedasticGPRAnalyticalScale`` profiled variance scale
        ``v* = err^T (K+S)^{-1} err / N`` is folded in automatically.
    d_new :
        Static query derivative order, one int per observable dim
        (default: all zeros — predict the function itself).  Build one
        predictor per order you serve.
    dtype :
        Serving dtype for the frozen constants and the kernel block.
    mean_new_fn :
        Override for the frozen mean: traceable
        ``locs (M, obs) -> (M, out_dim)`` returning actual mean values at
        ``d_new``.  Required for custom mean-function types.
    """
    if not isinstance(model, HeteroscedasticGPR):
        msg = (
            "freeze_predictor supports HeteroscedasticGPR models (the "
            f"experimental noise-GP variants train their own noise model); "
            f"got {type(model).__name__}"
        )
        raise TypeError(msg)
    obs = model.kernel.obs_dims
    d_new = (0,) * obs if d_new is None else tuple(int(d) for d in d_new)
    if len(d_new) != obs:
        msg = f"d_new must have {obs} entries, got {d_new}"
        raise ValueError(msg)
    dt = jnp.dtype(dtype)
    if dt == jnp.dtype("float64") and not jax.config.jax_enable_x64:
        # without x64, jnp.asarray(..., float64) silently truncates the
        # frozen constants to f32 while meta would still claim float64
        msg = (
            "dtype=float64 requires jax_enable_x64 (the package keeps x64 "
            "scoped to the host context by design); enable it process-wide "
            "or serve at the default float32"
        )
        raise ValueError(msg)

    # ---- host-f64 freeze: fold the training-side solves --------------------
    with _compute_ctx():
        split = _build_param_split(model._spec_struct())
        kernel_p, lik_p = split(
            jnp.asarray(model.get_unconstrained()), model._fixed_constrained()
        )
        pvals64 = [kernel_p[k] for k in model.kernel.params]
        groups = model._groups
        fns_mm = model.kernel.pair_table(groups, groups)
        kmm = _pair_masked_matrix(
            model._locs_np, model._gid_np, groups,
            model._locs_np, model._gid_np, groups, pvals64, fns_mm,
        )
        ks = kmm[None] + _scaled_noise_cov(
            jnp.asarray(model.likelihood.cov_np),
            jnp.asarray(model._dplus_np),
            lik_p,
            float(model.likelihood.stable_var_min),
        )
        chol = jnp.linalg.cholesky(ks)  # (D, N, N)
        err = jnp.moveaxis(jnp.asarray(model._y_np) - model._mean_x_np, 1, 0)
        b = jax.scipy.linalg.solve_triangular(chol, err[..., None], lower=True)
        w = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(chol, -1, -2), b, lower=False
        )[..., 0]  # (D, N) = (K+S)^{-1} err
        eye = jnp.broadcast_to(jnp.eye(chol.shape[-1]), chol.shape)
        # the WHITENED variance form ||L^{-1} k_*||^2 (not the folded
        # (K+S)^{-1}) keeps the f32 error ~ eps * sqrt(cond) instead of
        # eps * cond — measured ~10x tighter on the ill-conditioned
        # derivative Grams
        linv = jax.scipy.linalg.solve_triangular(chol, eye, lower=True)
        if isinstance(model, HeteroscedasticGPRAnalyticalScale):
            v = jnp.sum(b[..., 0] ** 2, axis=1) / err.shape[1]  # (D,)
        else:
            v = jnp.ones((err.shape[0],))
        w_np = np.asarray(w, np.float64)
        linv_np = np.asarray(linv, np.float64)
        var_scale_np = np.asarray(
            v * jnp.asarray(model.scale_fac) ** 2, np.float64
        )

    # ---- frozen device constants -------------------------------------------
    locs_c = jnp.asarray(model._locs_np, dt)
    gid_c = jnp.asarray(model._gid_np, jnp.int32)
    w_c = jnp.asarray(w_np, dt)
    linv_c = jnp.asarray(linv_np, dt)
    var_scale_c = jnp.asarray(var_scale_np, dt)
    scale_c = jnp.asarray(np.asarray(model.scale_fac, np.float64), dt)
    pvals_c = [jnp.asarray(float(p), dt) for p in pvals64]
    out_dim = model.out_dim

    fns_mn = model.kernel.pair_table(groups, (d_new,))
    fn_nn = model.kernel.pair_table((d_new,), (d_new,))[(d_new, d_new)]
    if mean_new_fn is None:
        mean_new_fn = _frozen_mean_fn(model.mean_function, d_new, out_dim, dt)

    def predict(locs_new):
        locs_new = locs_new.astype(dt)
        m = locs_new.shape[0]
        gid_new = jnp.zeros((m,), jnp.int32)
        kmn = _pair_masked_matrix(
            locs_c, gid_c, groups, locs_new, gid_new, (d_new,), pvals_c, fns_mn
        )  # (N, M)
        mean = (
            jnp.einsum("nm,dn->md", kmn, w_c) * scale_c[None, :]
            + mean_new_fn(locs_new)
        )
        a = jnp.einsum("dij,jm->dim", linv_c, kmn)  # (D, N, M) whitened
        qf = jnp.sum(a * a, axis=1)  # (D, M)
        cols = [locs_new[:, k] for k in range(locs_new.shape[1])]
        knn = jnp.broadcast_to(jnp.asarray(fn_nn(*cols, *cols, *pvals_c)), (m,))
        var = jnp.maximum(knn[None, :] - qf, 0.0) * var_scale_c[:, None]
        return mean, var.T

    meta = {
        "obs_dims": obs,
        "out_dim": out_dim,
        "d_new": d_new,
        "dtype": dt.name,
        "n_train": int(model._locs_np.shape[0]),
        "analytic_scale": isinstance(model, HeteroscedasticGPRAnalyticalScale),
    }
    return FrozenGPRPredictor(predict, meta=meta)
