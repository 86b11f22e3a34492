r"""Native MBAR (multistate Bennett acceptance ratio) in jax.

Replaces the reference's optional ``pymbar`` dependency
(/root/reference/src/thermoextrap/models.py:1049-1111 and the decorrelation
helpers in gpr_active/active_utils.py:244-266).

The MBAR self-consistent equations (Shirts & Chodera 2008):

.. math::

    f_k = -\log \sum_n \frac{\exp(-u_k(x_n))}
          {\sum_j N_j \exp(f_j - u_j(x_n))}

solved here by a jittable Newton / self-consistent hybrid (the algorithm
pymbar ships as its production ``"adaptive"`` solver) inside a
``lax.while_loop`` — logsumexp-stabilized, with the plain damped fixed point
kept as ``method="sci"`` for regression.

The Newton machinery works on the unconstrained MBAR objective
(Shirts & Chodera 2008, Eq. C1; gauge ``f_0 = 0``):

.. math::

    \Phi(f) = \sum_n \log \sum_j N_j e^{f_j - u_{jn}} - \sum_k N_k f_k,
    \qquad
    \partial_k \Phi = N_k (S_k - 1),\quad S_k = \sum_n \tilde W_{kn},

with :math:`\tilde W_{kn} = e^{f_k - u_{kn} - \log\mathrm{denom}_n}` and
Hessian :math:`H_{kl} = \delta_{kl} N_k S_k - N_k N_l (\tilde W \tilde
W^T)_{kl}` — one ``(K, N) @ (N, K)`` matmul per iteration (MXU-friendly;
``K`` is small, ``N`` can be 1e8).  Sample-axis reductions are plain
``sum``/``logsumexp`` over axis 1, so sharding ``u_kn`` over samples with
``jax.sharding`` makes every iteration a psum over the mesh — no shard_map
required.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.resample import poisson1_freq
import numpy as np
from jax.scipy.special import logsumexp

__all__ = [
    "mbar_bootstrap_expectations",
    "mbar_covariance",
    "mbar_expectations",
    "mbar_expectations_alphas",
    "mbar_expectations_grid",
    "mbar_fe_uncertainties",
    "mbar_log_weights",
    "mbar_overlap",
    "mbar_perturbed_free_energies",
    "mbar_solve",
    "mbar_solve_info",
    "statistical_inefficiency",
    "subsample_correlated_data",
]


def _self_consistent_update(f_k, u_kn, log_n_k, logm=None):
    # log denominator per sample: log sum_j N_j exp(f_j - u_jn)
    log_denom = logsumexp(
        (log_n_k + f_k)[:, None] - u_kn, axis=0
    )  # (N,)
    t = -u_kn - log_denom[None, :]
    if logm is not None:  # -inf masks padded samples out of sample sums
        t = t + logm[None, :]
    f_new = -logsumexp(t, axis=1)  # (K,)
    return f_new - f_new[0]


def _residual(f_k, u_kn, log_n_k, logm=None):
    """Per-state self-consistency residual ``S_k - 1``.

    ``S_k = sum_n W~_kn`` equals 1 at the MBAR solution for every state;
    ``max |S_k - 1|`` is the convergence measure (equivalent to pymbar's
    gradient norm up to the ``N_k`` scaling, but dimensionless and
    dtype-friendly: f32 sums over N samples carry ~sqrt(N)*eps noise, so
    f32 callers should use tol >= ~1e-4).
    """
    log_denom = logsumexp((log_n_k + f_k)[:, None] - u_kn, axis=0)  # (N,)
    t = f_k[:, None] - u_kn - log_denom[None, :]
    if logm is not None:
        t = t + logm[None, :]
    log_s = logsumexp(t, axis=1)
    return jnp.expm1(log_s)  # (K,)  = S_k - 1


def _newton_state(f_k, u_kn, log_n_k, logm=None):
    """Gradient (scaled), Hessian, and the W~ row sums in one pass."""
    n_k = jnp.exp(log_n_k)
    log_denom = logsumexp((log_n_k + f_k)[:, None] - u_kn, axis=0)  # (N,)
    logw = f_k[:, None] - u_kn - log_denom[None, :]  # (K, N)
    if logm is not None:
        logw = logw + logm[None, :]
    w = jnp.exp(logw)
    s_k = jnp.sum(w, axis=1)  # (K,)
    grad = n_k * (s_k - 1.0)  # (K,)
    # H_kl = delta_kl N_k S_k - N_k N_l (W W^T)_kl  — one skinny matmul
    g = w @ w.T  # (K, K)
    hess = jnp.diag(n_k * s_k) - (n_k[:, None] * n_k[None, :]) * g
    return grad, hess, s_k


def _newton_update(f_k, u_kn, log_n_k, logm=None):
    """One gauge-fixed Newton step on the reduced coordinates f[1:]."""
    grad, hess, _ = _newton_state(f_k, u_kn, log_n_k, logm)
    k = f_k.shape[0]
    eye = jnp.eye(k - 1, dtype=f_k.dtype)
    h_red = hess[1:, 1:]
    # tiny Tikhonov floor keeps the (K-1)x(K-1) solve sane if two states
    # coincide; at normal conditioning it is far below the Newton step size
    h_red = h_red + eye * (1e-10 * jnp.trace(h_red) / (k - 1))
    delta = jnp.linalg.solve(h_red, grad[1:])
    f_new = f_k.at[1:].add(-delta)
    return f_new - f_new[0]


def mbar_solve(
    u_kn,
    n_k,
    tol: float | None = None,
    max_iter: int = 10000,
    method: str = "hybrid",
    log_sample_weight=None,
):
    """Solve for dimensionless free energies ``f_k`` (gauge ``f_0 = 0``).

    ``u_kn``: reduced potentials, shape ``(K, N)`` (every sample evaluated in
    every state); ``n_k``: samples drawn from each state, shape ``(K,)``.

    method="hybrid" (default): each iteration computes BOTH the
    self-consistent and the Newton candidate and keeps whichever has the
    smaller self-consistency residual — pymbar's production "adaptive"
    solver (typically converges in 5–20 iterations where the plain fixed
    point needs hundreds to thousands).  method="sci": the plain fixed
    point, converged on ``max |Δf|`` (round-2 behaviour, kept for
    regression).  ``tol`` defaults to 1e-12 in f64 and 1e-5 in f32 (f32
    sample sums carry ~sqrt(N)·eps noise — don't ask for tighter than the
    accumulation allows).

    Fully jittable; with ``u_kn`` sharded over samples on a Mesh the
    reductions become mesh psums automatically (see
    ``parallel.sharded.mbar_solve_sharded``).
    """
    f, _, _ = mbar_solve_info(
        u_kn,
        n_k,
        tol=tol,
        max_iter=max_iter,
        method=method,
        log_sample_weight=log_sample_weight,
    )
    return f


def mbar_solve_info(
    u_kn,
    n_k,
    tol: float | None = None,
    max_iter: int = 10000,
    method: str = "hybrid",
    log_sample_weight=None,
):
    """Like :func:`mbar_solve` but also returns ``(f_k, n_iter, residual)``
    (iteration count and final ``max |S_k - 1|``) for diagnostics/benches.

    ``log_sample_weight`` (N,): optional per-sample log-weight added to every
    sample-axis reduction; ``-inf`` entries drop samples entirely — the
    zero-weight-padding seam the sharded wrapper uses for N not divisible by
    the mesh size (note the mixture denominator still sums the TRUE ``n_k``
    over real samples; padded columns only ever appear under the mask).
    """
    u_kn = jnp.asarray(u_kn)
    n_k = jnp.asarray(n_k, dtype=u_kn.dtype)
    log_n_k = jnp.log(n_k)
    logm = (
        None
        if log_sample_weight is None
        else jnp.asarray(log_sample_weight, dtype=u_kn.dtype)
    )
    if tol is None:
        tol = 1e-12 if u_kn.dtype == jnp.float64 else 1e-5
    k = u_kn.shape[0]

    if method == "sci" or k < 2:

        def cond(carry):
            f, f_prev, i = carry
            return (jnp.max(jnp.abs(f - f_prev)) > tol) & (i < max_iter)

        def body(carry):
            f, _, i = carry
            return _self_consistent_update(f, u_kn, log_n_k, logm), f, i + 1

        f0 = jnp.zeros(k, dtype=u_kn.dtype)
        f, _, i = jax.lax.while_loop(
            cond,
            body,
            (_self_consistent_update(f0, u_kn, log_n_k, logm), f0, 1),
        )
        return f, i, jnp.max(jnp.abs(_residual(f, u_kn, log_n_k, logm)))

    if method != "hybrid":
        msg = f"unknown MBAR method {method!r} (use 'hybrid' or 'sci')"
        raise ValueError(msg)

    def cond(carry):
        _f, res, i = carry
        return (res > tol) & (i < max_iter)

    def body(carry):
        f, _, i = carry
        f_sc = _self_consistent_update(f, u_kn, log_n_k, logm)
        f_nw = _newton_update(f, u_kn, log_n_k, logm)
        r_sc = jnp.max(jnp.abs(_residual(f_sc, u_kn, log_n_k, logm)))
        r_nw = jnp.max(jnp.abs(_residual(f_nw, u_kn, log_n_k, logm)))
        # a NaN Newton step (singular Hessian) loses every comparison
        take_newton = jnp.isfinite(r_nw) & (r_nw < r_sc)
        f_new = jnp.where(take_newton, f_nw, f_sc)
        return f_new, jnp.where(take_newton, r_nw, r_sc), i + 1

    f0 = jnp.zeros(k, dtype=u_kn.dtype)
    res0 = jnp.max(jnp.abs(_residual(f0, u_kn, log_n_k, logm)))
    f, res, i = jax.lax.while_loop(cond, body, (f0, res0, 0))
    return f, i, res


def mbar_log_weights(u_kn, n_k, f_k, u_target):
    """Log MBAR weights of each sample in a (possibly new) target state."""
    log_n_k = jnp.log(jnp.asarray(n_k, dtype=u_kn.dtype))
    log_denom = logsumexp((log_n_k + f_k)[:, None] - u_kn, axis=0)
    logw = -u_target - log_denom
    return logw - logsumexp(logw)


def mbar_expectations(u_kn, n_k, f_k, u_target, x_n):
    """``<x>`` in the target state: ``x_n`` shape ``(N, V)`` → ``(V,)``."""
    logw = mbar_log_weights(u_kn, n_k, f_k, u_target)
    w = jnp.exp(logw)
    return w @ x_n


def mbar_expectations_grid(
    u_kn, n_k, f_k, u_targets, x_n, log_sample_weight=None
):
    """``<x>`` at MANY target states in one shot.

    ``u_targets``: reduced potentials of each target evaluated on all
    samples, shape ``(A, N)``; ``x_n``: ``(N, V)``.  Returns ``(A, V)``.

    The mixture log-denominator is computed ONCE and the weighted averages
    become a single ``(A, N) @ (N, V)`` matmul — the MBAR analogue of the
    batched extrapolation predict (reference models.py:1093-1105 loops
    ``compute_multiple_expectations`` per alpha)."""
    u_kn = jnp.asarray(u_kn)
    u_targets = jnp.asarray(u_targets, dtype=u_kn.dtype)
    log_n_k = jnp.log(jnp.asarray(n_k, dtype=u_kn.dtype))
    log_denom = logsumexp((log_n_k + f_k)[:, None] - u_kn, axis=0)  # (N,)
    return _grid_from_denom(
        log_denom,
        u_targets,
        jnp.asarray(x_n, dtype=u_kn.dtype),
        log_sample_weight,
    )


def _grid_from_denom(log_denom, u_targets, x_n, log_sample_weight=None):
    logw = -u_targets - log_denom[None, :]  # (A, N)
    if log_sample_weight is not None:
        logw = logw + jnp.asarray(log_sample_weight, logw.dtype)[None, :]
    logw = logw - logsumexp(logw, axis=1, keepdims=True)
    return jnp.exp(logw) @ x_n  # (A, V)


def mbar_expectations_alphas(
    u_kn,
    n_k,
    f_k,
    alphas,
    u_base,
    x_n,
    chunk: int = 8,
    log_sample_weight=None,
):
    """``<x>`` at linear-in-α targets ``u_a(x_n) = α_a · u_base_n``.

    The β-reweighting case (target reduced potential proportional to one
    base energy stream — reference models.py:1093-1105).  Unlike
    :func:`mbar_expectations_grid` the ``(A, N)`` target matrix is never
    materialized: the mixture log-denominator is computed ONCE, then a
    ``lax.map`` over α-chunks streams ``chunk × N`` blocks — serving-scale
    ``N`` (1e8) with hundreds of targets fits in HBM.  Returns ``(A, V)``.
    """
    u_kn = jnp.asarray(u_kn)
    alphas = jnp.asarray(alphas, dtype=u_kn.dtype)
    u_base = jnp.asarray(u_base, dtype=u_kn.dtype)
    x_n = jnp.asarray(x_n, dtype=u_kn.dtype)
    if x_n.ndim == 1:
        x_n = x_n[:, None]
    log_n_k = jnp.log(jnp.asarray(n_k, dtype=u_kn.dtype))
    f_k = jnp.asarray(f_k, dtype=u_kn.dtype)
    log_denom = logsumexp((log_n_k + f_k)[:, None] - u_kn, axis=0)  # (N,)

    a = alphas.shape[0]
    n_pad = -a % chunk
    a_pad = jnp.concatenate([alphas, jnp.zeros(n_pad, alphas.dtype)])

    def body(a_blk):
        return _grid_from_denom(
            log_denom,
            a_blk[:, None] * u_base[None, :],
            x_n,
            log_sample_weight,
        )

    out = jax.lax.map(body, a_pad.reshape(-1, chunk))  # (A/chunk, chunk, V)
    return out.reshape(-1, x_n.shape[1])[:a]


# ---------------------------------------------------------------------------
# Uncertainties
# ---------------------------------------------------------------------------
#
# Two estimators, mirroring pymbar 4.x (whose results the reference discards
# — models.py:1095-1100 keeps only ["mu"]):
#
# * asymptotic covariance of the free energies (Kong et al. 2003 via the
#   svd-ew route pymbar defaults to): one (K, N) @ (N, K) device matmul,
#   then K x K eigen math pinned to host f64 (TPU has no f64 eigh — same
#   policy as gpr_active/gp_models._compute_ctx);
# * Poisson bootstrap for EXPECTATIONS (pymbar 4 added n_bootstraps for
#   exactly this reason: the augmented-Theta expectation variance is
#   fragile).  The per-replicate weighted MBAR problem reuses the
#   ``log_sample_weight`` seam — weight c_n per sample, per-state weight
#   sums as n_k — and vmaps the whole solve+reweight over replicates.


def mbar_covariance(u_kn, n_k, f_k, log_sample_weight=None):
    """Asymptotic covariance ``Theta`` (K, K) of the ``f_k`` estimates.

    ``Theta = V S (I - S V^T N V S)^+ S V^T`` where ``W^T W = V S^2 V^T``
    for the (N, K) normalized weight matrix ``W_nk`` and ``N = diag(n_k)``
    (Shirts & Chodera 2008 Appendix D, pymbar's default "svd-ew" method).
    The N-sized contraction ``W^T W`` runs on device; the K x K eigen/
    pseudo-inverse runs in host numpy f64.  Uncertainty of a difference:
    ``var(f_i - f_j) = Theta_ii + Theta_jj - 2 Theta_ij``
    (:func:`mbar_fe_uncertainties`).
    """
    u_kn = jnp.asarray(u_kn)
    log_n_k = jnp.log(jnp.asarray(n_k, dtype=u_kn.dtype))
    logm = (
        None
        if log_sample_weight is None
        else jnp.asarray(log_sample_weight, dtype=u_kn.dtype)
    )
    # O = W^T W for the exact (unnormalized-by-S_k) weight matrix; at the
    # solution every column sum S_k ~ 1 so no renormalization is needed.
    log_denom = logsumexp((log_n_k + jnp.asarray(f_k, u_kn.dtype))[:, None] - u_kn, axis=0)
    logw = jnp.asarray(f_k, u_kn.dtype)[:, None] - u_kn - log_denom[None, :]
    if logm is not None:
        logw = logw + logm[None, :]
    w = jnp.exp(logw)  # (K, N) = W^T
    o = np.asarray(w @ w.T, dtype=np.float64)  # device matmul, host f64 after

    n_diag = np.asarray(n_k, dtype=np.float64)
    evals, v = np.linalg.eigh((o + o.T) / 2.0)
    s = np.sqrt(np.clip(evals, 0.0, None))
    inner = np.eye(len(s)) - (s[:, None] * (v.T @ (n_diag[:, None] * v)) * s[None, :])
    theta = (v * s[None, :]) @ np.linalg.pinv(inner) @ (s[:, None] * v.T)
    return theta


def mbar_perturbed_free_energies(
    u_kn, n_k, f_k, u_targets, log_sample_weight=None
):
    """Free energies of (possibly unsampled) target states, gauge ``f_0=0``.

    pymbar's ``compute_perturbed_free_energies``:
    ``f_a = -log sum_n exp(-u_a(x_n) - log_denom_n)`` with the mixture
    denominator from the solved ``f_k``.  ``u_targets`` (A, N) → (A,).
    One streaming logsumexp per target; no solve needed.
    """
    u_kn = jnp.asarray(u_kn)
    u_targets = jnp.asarray(u_targets, u_kn.dtype)
    log_n_k = jnp.log(jnp.asarray(n_k, dtype=u_kn.dtype))
    f_k = jnp.asarray(f_k, u_kn.dtype)
    log_denom = logsumexp((log_n_k + f_k)[:, None] - u_kn, axis=0)
    t = -u_targets - log_denom[None, :]
    if log_sample_weight is not None:
        t = t + jnp.asarray(log_sample_weight, u_kn.dtype)[None, :]
    return -logsumexp(t, axis=1)


def mbar_overlap(u_kn, n_k, f_k, log_sample_weight=None):
    """State-overlap matrix ``O_ij = N_j * sum_n W_ni W_nj`` (K, K).

    pymbar's ``compute_overlap`` diagnostic: row i gives the fraction of
    state i's information coming from samples of each state; rows sum to 1
    and ``min_ij O`` near 0 flags a disconnected reweighting graph (the
    usual cause of garbage free energies).  One (K, N) @ (N, K) device
    matmul.
    """
    u_kn = jnp.asarray(u_kn)
    n_kv = jnp.asarray(n_k, dtype=u_kn.dtype)
    log_n_k = jnp.log(n_kv)
    f_k = jnp.asarray(f_k, u_kn.dtype)
    log_denom = logsumexp((log_n_k + f_k)[:, None] - u_kn, axis=0)
    logw = f_k[:, None] - u_kn - log_denom[None, :]  # (K, N) = W^T
    if log_sample_weight is not None:
        logw = logw + jnp.asarray(log_sample_weight, u_kn.dtype)[None, :]
    w = jnp.exp(logw)
    return (w @ w.T) * n_kv[None, :]


def mbar_fe_uncertainties(theta):
    """``d(f_i - f_j)`` matrix (K, K) from a covariance ``Theta``."""
    theta = np.asarray(theta)
    d = np.diag(theta)
    var = d[:, None] + d[None, :] - 2.0 * theta
    return np.sqrt(np.clip(var, 0.0, None))


def mbar_bootstrap_expectations(
    u_kn,
    n_k,
    u_targets,
    x_n,
    nrep: int = 100,
    key=None,
    tol: float | None = None,
    max_iter: int = 1000,
    method: str = "hybrid",
    rep_chunk: int = 8,
):
    """Poisson-bootstrap mean and std of ``<x>`` at each target state.

    Every replicate draws Poisson(1) counts ``c_n`` per sample and solves
    the weighted MBAR problem (counts as ``log_sample_weight``, per-state
    count sums as ``n_k`` — both the numerator sums and the mixture
    denominator see the SAME reweighted ensemble), then evaluates the
    target grid.  Replicates are vmapped in chunks of ``rep_chunk`` under a
    ``lax.map`` so the (chunk, K, N) weight temporaries bound HBM.

    ``n_k`` defines the per-state contiguous sample blocks (samples must be
    ordered state-by-state, the layout :class:`MBARModel` pools).  Returns
    ``(mean, std)`` each shaped ``(A, V)``.
    """
    u_kn = jnp.asarray(u_kn)
    u_targets = jnp.asarray(u_targets, u_kn.dtype)
    x_n = jnp.asarray(x_n, u_kn.dtype)
    if x_n.ndim == 1:
        x_n = x_n[:, None]
    if key is None:
        key = jax.random.key(0)
    n_k_host = np.asarray(n_k, dtype=np.int64)
    state_id = jnp.asarray(np.repeat(np.arange(len(n_k_host)), n_k_host))
    k_states = u_kn.shape[0]

    def one_rep(rep_key):
        c = poisson1_freq(rep_key, (u_kn.shape[1],), dtype=u_kn.dtype)
        n_rep = jax.ops.segment_sum(c, state_id, num_segments=k_states)
        logc = jnp.log(c)  # log(0) = -inf drops the sample exactly
        f, _, _ = mbar_solve_info(
            u_kn,
            n_rep,
            tol=tol,
            max_iter=max_iter,
            method=method,
            log_sample_weight=logc,
        )
        return mbar_expectations_grid(
            u_kn, n_rep, f, u_targets, x_n, log_sample_weight=logc
        )

    n_pad = -nrep % rep_chunk
    keys = jax.random.split(key, nrep + n_pad)

    out = jax.lax.map(
        lambda ks: jax.vmap(one_rep)(ks),
        keys.reshape(-1, rep_chunk),
    ).reshape(nrep + n_pad, u_targets.shape[0], x_n.shape[1])[:nrep]
    return out.mean(axis=0), out.std(axis=0, ddof=1)


def statistical_inefficiency(x, y=None, mintime: int = 3):
    """Integrated (cross-)correlation time estimator ``g = 1 + 2 sum C(t)``.

    FFT-based autocorrelation with positive-sequence truncation — jax
    replacement for ``pymbar.timeseries.statistical_inefficiency``
    (used at /root/reference/src/thermoextrap/gpr_active/active_utils.py:244-266).

    With ``y`` given, estimates the CROSS statistical inefficiency from the
    symmetrized cross-correlation ``C(t) = (<dx(0)dy(t)> + <dy(0)dx(t)>)/2``
    normalized by ``<dx dy>`` (pymbar's two-series form — the reference
    takes the max over per-series AND cross g when subsampling, reference
    active_utils.py:256-264).

    Examples
    --------
    >>> import numpy as np
    >>> rng = np.random.default_rng(0)
    >>> white = rng.normal(size=4000)
    >>> float(statistical_inefficiency(white)) < 1.3  # iid data: g ~ 1
    True
    >>> ar = np.empty(4000)  # AR(1), rho=0.9: g ~ (1+rho)/(1-rho) = 19
    >>> ar[0] = 0.0
    >>> for t in range(1, 4000):
    ...     ar[t] = 0.9 * ar[t - 1] + rng.normal()
    >>> 8.0 < float(statistical_inefficiency(ar)) < 40.0
    True
    """
    x = jnp.asarray(x, dtype=jnp.result_type(x, jnp.float32))
    n = x.shape[0]
    dx = x - x.mean()
    nfft = 2 * n
    f = jnp.fft.rfft(dx, n=nfft)
    if y is None:
        spec = f * jnp.conj(f)
    else:
        y = jnp.asarray(y, dtype=x.dtype)
        dy = y - y.mean()
        fy = jnp.fft.rfft(dy, n=nfft)
        # symmetrized cross spectrum: (xy + yx)/2 is real for real series
        spec = 0.5 * (f * jnp.conj(fy) + fy * jnp.conj(f))
    acf = jnp.fft.irfft(spec, n=nfft)[:n].real
    acf0 = acf[0]
    safe0 = jnp.where(jnp.abs(acf0) > 0, acf0, 1.0)
    acf = acf / safe0
    norm = (n - jnp.arange(n)) / n
    c_t = acf / norm
    t = jnp.arange(n)
    # accumulate 2*(1 - t/n)*C(t) while C(t) > 0 (after mintime always count)
    positive = (c_t > 0) | (t < mintime)
    # once negative, stop contributing (emulate sequential break with cummin)
    alive = jnp.cumprod(positive.astype(x.dtype))
    g = 1.0 + 2.0 * jnp.sum(alive[1:] * c_t[1:] * (1.0 - t[1:] / n))
    # degenerate cross-covariance (<dx dy> == 0): no decorrelation signal
    g = jnp.where(jnp.abs(acf0) > 0, g, 1.0)
    return jnp.maximum(g, 1.0)


def subsample_correlated_data(x, g=None):
    """Indices of an effectively-uncorrelated subsample (host-side helper)."""
    x = np.asarray(x)
    if g is None:
        g = float(statistical_inefficiency(x))
    stride = max(int(np.ceil(g)), 1)
    return np.arange(0, x.shape[0], stride)
