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
import numpy as np
from jax.scipy.special import logsumexp

__all__ = [
    "mbar_expectations",
    "mbar_expectations_alphas",
    "mbar_expectations_grid",
    "mbar_log_weights",
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
