r"""Truncated Taylor-series (jet) algebra.

This module is the TPU-native replacement for the reference's runtime sympy
engine (/root/reference/src/thermoextrap/models.py:102-287 ``SymDerivBase`` /
``SymMinusLog`` and the recursive ``fdiff`` rules in beta.py:32-266).  Every
thermodynamic derivative in the reference is the Taylor expansion in
:math:`\Delta = \alpha - \alpha_0` of a ratio / product of *finite* power
series whose coefficients are moment-array entries, e.g.

.. math::

    \langle x \rangle(\beta_0+\Delta)
      = \frac{\langle x\, e^{-\Delta \delta u}\rangle_0}
             {\langle e^{-\Delta \delta u}\rangle_0}

so instead of symbolically differentiating and lambdifying at runtime we do
exact O(order^2) coefficient recursions.  All loops below run over the
*static* series order at trace time, so XLA sees fully unrolled, fusable
elementwise arithmetic — no dynamic shapes, no python at run time.

Conventions
-----------
A series is an array ``c`` with leading axis of length ``K+1`` holding the
*normalized* Taylor coefficients ``c[n] = f^(n)(0) / n!``.  Remaining axes are
arbitrary batch axes (bootstrap replicates, observable vector components, …)
and broadcast elementwise.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = [
    "series_compose_linear",
    "series_div",
    "series_inv",
    "series_log",
    "series_mul",
    "series_neg_log",
    "series_pow",
    "derivs_from_coefs",
    "coefs_from_derivs",
]


def _broadcast_terms(terms):
    """Sum a list of broadcast-compatible arrays."""
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def series_mul(a, b, order: int | None = None):
    """Cauchy product ``c[n] = sum_k a[k] b[n-k]``, truncated at ``order``.

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> a = jnp.array([1.0, 2.0])  # 1 + 2x
    >>> b = jnp.array([1.0, 1.0, 1.0])  # 1 + x + x^2
    >>> [float(c) for c in series_mul(a, b)]
    [1.0, 3.0, 3.0, 2.0]
    """
    ka, kb = a.shape[0] - 1, b.shape[0] - 1
    if order is None:
        order = ka + kb
    out = []
    for n in range(order + 1):
        terms = [a[k] * b[n - k] for k in range(max(0, n - kb), min(n, ka) + 1)]
        if not terms:
            out.append(jnp.zeros(jnp.broadcast_shapes(a.shape[1:], b.shape[1:])))
        else:
            out.append(_broadcast_terms(terms))
    return jnp.stack(jnp.broadcast_arrays(*out), axis=0)


def series_div(a, b, order: int | None = None):
    """Series division ``c = a / b``: ``c[n] = (a[n] - sum_{k>=1} b[k] c[n-k]) / b[0]``.

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> a = jnp.array([1.0, 3.0, 3.0, 2.0])  # (1 + 2x)(1 + x + x^2)
    >>> b = jnp.array([1.0, 1.0, 1.0])
    >>> [float(c) for c in series_div(a, b)]
    [1.0, 2.0, 0.0, 0.0]
    """
    if order is None:
        order = a.shape[0] - 1
    kb = b.shape[0] - 1
    inv_b0 = 1.0 / b[0]
    cs = []
    for n in range(order + 1):
        an = a[n] if n < a.shape[0] else jnp.zeros(a.shape[1:])
        terms = [b[k] * cs[n - k] for k in range(1, min(n, kb) + 1)]
        num = an - _broadcast_terms(terms) if terms else an
        cs.append(num * inv_b0)
    return jnp.stack(jnp.broadcast_arrays(*cs), axis=0)


def series_inv(b, order: int | None = None):
    """Series reciprocal ``1 / b``."""
    if order is None:
        order = b.shape[0] - 1
    one = jnp.zeros((order + 1,) + b.shape[1:], dtype=b.dtype).at[0].set(1.0)
    return series_div(one, b, order=order)


def series_pow(a, i: int, order: int | None = None):
    """Integer power ``a**i`` by repeated squaring on series."""
    if order is None:
        order = a.shape[0] - 1
    if i < 0:
        return series_inv(series_pow(a, -i, order=order), order=order)
    result = jnp.zeros((order + 1,) + a.shape[1:], dtype=a.dtype).at[0].set(1.0)
    base = a
    n = i
    while n:
        if n & 1:
            result = series_mul(result, base, order=order)
        n >>= 1
        if n:
            base = series_mul(base, base, order=order)
    return result


def series_log(a, order: int | None = None):
    r"""Series logarithm.

    With normalized coefficients, ``g = log(a)`` satisfies
    ``n g[n] = n a[n]/a[0] - sum_{k=1}^{n-1} k g[k] a[n-k] / a[0]``
    (from ``a g' = a'``).  Replaces the Bell-polynomial machinery of the
    reference ``SymMinusLog`` (/root/reference/src/thermoextrap/models.py:261-287).
    """
    if order is None:
        order = a.shape[0] - 1
    inv_a0 = 1.0 / a[0]
    gs = [jnp.log(a[0])]
    for n in range(1, order + 1):
        an = a[n] if n < a.shape[0] else jnp.zeros(a.shape[1:])
        terms = [
            (k / n) * gs[k] * a[n - k]
            for k in range(1, n)
            if n - k < a.shape[0]
        ]
        num = an - _broadcast_terms(terms) if terms else an
        gs.append(num * inv_a0)
    return jnp.stack(jnp.broadcast_arrays(*gs), axis=0)


def series_neg_log(a, order: int | None = None):
    """``-log(a)`` as a series (the reference's ``minus_log`` post-transform)."""
    return -series_log(a, order=order)


def series_compose_linear(a, scale):
    """Compose series with ``Delta -> scale * Delta`` (coefficient rescale)."""
    factors = jnp.asarray([scale**n for n in range(a.shape[0])])
    return a * factors.reshape((-1,) + (1,) * (a.ndim - 1))


def derivs_from_coefs(c):
    """Convert normalized Taylor coefficients to derivatives: ``f^(n) = n! c[n]``."""
    facts = jnp.asarray(
        [math.factorial(n) for n in range(c.shape[0])], dtype=c.dtype
    )
    return c * facts.reshape((-1,) + (1,) * (c.ndim - 1))


def coefs_from_derivs(d):
    """Inverse of :func:`derivs_from_coefs`."""
    facts = jnp.asarray(
        [1.0 / math.factorial(n) for n in range(d.shape[0])], dtype=d.dtype
    )
    return d * facts.reshape((-1,) + (1,) * (d.ndim - 1))
