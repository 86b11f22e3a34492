r"""Native MBAR (multistate Bennett acceptance ratio) in jax.

Replaces the reference's optional ``pymbar`` dependency
(/root/reference/src/thermoextrap/models.py:1049-1111 and the decorrelation
helpers in gpr_active/active_utils.py:244-266).

The MBAR self-consistent equations (Shirts & Chodera 2008):

.. math::

    f_k = -\log \sum_n \frac{\exp(-u_k(x_n))}
          {\sum_j N_j \exp(f_j - u_j(x_n))}

solved here by damped fixed-point iteration with a ``lax.while_loop`` —
fully jittable, logsumexp-stabilized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

__all__ = [
    "mbar_expectations",
    "mbar_log_weights",
    "mbar_solve",
    "statistical_inefficiency",
    "subsample_correlated_data",
]


def _self_consistent_update(f_k, u_kn, log_n_k):
    # log denominator per sample: log sum_j N_j exp(f_j - u_jn)
    log_denom = logsumexp(
        (log_n_k + f_k)[:, None] - u_kn, axis=0
    )  # (N,)
    f_new = -logsumexp(-u_kn - log_denom[None, :], axis=1)  # (K,)
    return f_new - f_new[0]


def mbar_solve(u_kn, n_k, tol: float = 1e-12, max_iter: int = 10000):
    """Solve for dimensionless free energies ``f_k``.

    ``u_kn``: reduced potentials, shape ``(K, N)`` (every sample evaluated in
    every state); ``n_k``: samples drawn from each state, shape ``(K,)``.
    """
    u_kn = jnp.asarray(u_kn)
    n_k = jnp.asarray(n_k, dtype=u_kn.dtype)
    log_n_k = jnp.log(n_k)

    def cond(carry):
        f, f_prev, i = carry
        return (jnp.max(jnp.abs(f - f_prev)) > tol) & (i < max_iter)

    def body(carry):
        f, _, i = carry
        return _self_consistent_update(f, u_kn, log_n_k), f, i + 1

    f0 = jnp.zeros(u_kn.shape[0], dtype=u_kn.dtype)
    f, _, _ = jax.lax.while_loop(
        cond, body, (_self_consistent_update(f0, u_kn, log_n_k), f0, 0)
    )
    return f


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
