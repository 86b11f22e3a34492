r"""Closed-form thermodynamic derivative engine.

TPU-native replacement for the reference's runtime-sympy derivative layer:
``SymFuncBase``/``SymDerivBase``/``SymSubs``/``Lambdify``/``SymMinusLog``
(/root/reference/src/thermoextrap/models.py:60-287) and the per-ensemble
fluctuation recursions (/root/reference/src/thermoextrap/beta.py:32-266).

Every observable supported by the reference is the Taylor expansion in
:math:`\Delta=\beta-\beta_0` of a ratio of *finite* power series built from
the sampled moments.  The central identity (all :math:`\langle\cdot\rangle`
at :math:`\beta_0`, :math:`\delta u = u - \langle u\rangle`):

.. math::

    \langle A(\beta_0{+}\Delta)\rangle_{\beta_0+\Delta}
      = \frac{\langle A\, e^{-\Delta \delta u}\rangle}
             {\langle e^{-\Delta \delta u}\rangle}

(the :math:`e^{-\Delta\langle u\rangle}` factors cancel, which is what makes
the central-moment form numerically stable).  Expanding numerator and
denominator and dividing the truncated series (ops/series.py) yields the
*exact* derivatives — identical values to the reference's symbolic
recursions (verified against a sympy oracle in tests/test_derivatives.py).

Everything here is jit/vmap/pjit-compatible: static orders, unrolled
coefficient recursions, pure array arithmetic.

Normalization: "coefs" are Taylor coefficients ``f^(n)/n!``; "derivs" are
plain derivatives ``f^(n)`` (reference convention, models.py:317-402).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from math import comb
from typing import Any, Callable

import jax.numpy as jnp

from ..ops.series import (
    derivs_from_coefs,
    series_div,
    series_mul,
    series_neg_log,
    series_pow,
)

__all__ = [
    "Derivatives",
    "central_u_ave_coefs",
    "central_x_ave_coefs",
    "central_x_ave_coefs_xalpha",
    "dun_ave_coefs",
    "dxdun_ave_coefs",
    "lnpi_coefs",
    "raw_u_ave_coefs",
    "raw_x_ave_coefs",
    "raw_x_ave_coefs_xalpha",
    "un_ave_coefs",
    "xun_ave_coefs",
]


def _alt(n: int) -> float:
    """(-1)^n / n!"""
    return (-1.0) ** n / math.factorial(n)


def _stack(rows):
    return jnp.stack(jnp.broadcast_arrays(*rows), axis=0)


# ---------------------------------------------------------------------------
# denominator series <e^{-Delta du}> (central) and <e^{-Delta u}> (raw)
# ---------------------------------------------------------------------------


def _den_series(m, order: int):
    """B[k] = (-1)^k m[k] / k! for k <= order (m = du or raw u moments)."""
    return _stack([_alt(k) * m[k] for k in range(order + 1)])


# ---------------------------------------------------------------------------
# <x> observables (reference SymDerivBeta.x_ave, beta.py:277-301)
# ---------------------------------------------------------------------------


def raw_x_ave_coefs(u, xu, order: int):
    r"""Taylor coefs of <x>(b0+Delta) from raw moments u[n]=<u^n>, xu[n]=<x u^n>."""
    a = _stack([_alt(n) * xu[n] for n in range(order + 1)])
    b = _den_series(u, order)
    return series_div(a, b, order=order)


def raw_x_ave_coefs_xalpha(u, xu, order: int):
    r"""As :func:`raw_x_ave_coefs` with beta-dependent x: xu[n, d]=<x^{(d)} u^n>."""
    rows = []
    for m in range(order + 1):
        rows.append(
            sum(
                (1.0 / math.factorial(d)) * _alt(m - d) * xu[m - d, d]
                for d in range(m + 1)
            )
        )
    a = _stack(rows)
    b = _den_series(u, order)
    return series_div(a, b, order=order)


def central_x_ave_coefs(x1, du, dxdu, order: int):
    r"""Central-moment form: x1=<x>, du[n]=<du^n>, dxdu[n]=<dx du^n> (dxdu[0]=0)."""
    b = _den_series(du, order)
    a = _stack([x1 * b[n] + _alt(n) * dxdu[n] for n in range(order + 1)])
    return series_div(a, b, order=order)


def central_x_ave_coefs_xalpha(x1, du, dxdu, order: int):
    r"""Central, beta-dependent x: x1[d]=<x^{(d)}>, dxdu[n, d]=<dx^{(d)} du^n>."""
    rows = []
    for m in range(order + 1):
        rows.append(
            sum(
                (1.0 / math.factorial(d))
                * _alt(m - d)
                * (x1[d] * du[m - d] + dxdu[m - d, d])
                for d in range(m + 1)
            )
        )
    a = _stack(rows)
    b = _den_series(du, order)
    return series_div(a, b, order=order)


# ---------------------------------------------------------------------------
# <u> observables (reference SymDerivBeta.u_ave, beta.py:303-321)
# ---------------------------------------------------------------------------


def raw_u_ave_coefs(u, order: int):
    a = _stack([_alt(n) * u[n + 1] for n in range(order + 1)])
    b = _den_series(u, order)
    return series_div(a, b, order=order)


def central_u_ave_coefs(uave, du, order: int):
    r"""<u>(b0+Delta) = <u>_0 + <du e^{-D du}>/<e^{-D du}>."""
    a = _stack([_alt(n) * du[n + 1] for n in range(order + 1)])
    b = _den_series(du, order)
    c = series_div(a, b, order=order)
    return c.at[0].add(uave)


# ---------------------------------------------------------------------------
# <u^n>, <x^{(d)} u^n> raw observables (beta.py:402-462)
# ---------------------------------------------------------------------------


def un_ave_coefs(u, n: int, order: int):
    a = _stack([_alt(p) * u[n + p] for p in range(order + 1)])
    b = _den_series(u, order)
    return series_div(a, b, order=order)


def xun_ave_coefs(u, xu, n: int, order: int, d: int | None = None):
    if d is None:
        a = _stack([_alt(m) * xu[n + m] for m in range(order + 1)])
    else:
        rows = []
        for m in range(order + 1):
            rows.append(
                sum(
                    (1.0 / math.factorial(j)) * _alt(m - j) * xu[n + m - j, d + j]
                    for j in range(m + 1)
                )
            )
        a = _stack(rows)
    b = _den_series(u, order)
    return series_div(a, b, order=order)


# ---------------------------------------------------------------------------
# central fluctuation observables <du^n>, <dx^{(d)} du^n> (beta.py:323-400)
# ---------------------------------------------------------------------------


def _g_series(du, k: int, order: int):
    r"""G_k(Delta) = <(d0u)^k>_{b0+Delta} where d0u = u - <u>_{b0} (fixed shift)."""
    a = _stack([_alt(p) * du[k + p] for p in range(order + 1)])
    b = _den_series(du, order)
    return series_div(a, b, order=order)


def dun_ave_coefs(du, n: int, order: int):
    r"""Taylor coefs of <(u - <u>(b))^n>(b0+Delta).

    Expansion about the *fixed* reference mean: with dm(D) = <u>(D) - <u>_0,
    ``<du^n>(D) = sum_k C(n,k) G_k(D) (-dm(D))^{n-k}`` and ``dm = G_1``.
    Requires du entries up to ``n + order``.
    """
    g1 = _g_series(du, 1, order)
    neg_g1 = -g1
    out = None
    for k in range(n + 1):
        gk = _g_series(du, k, order)
        term = comb(n, k) * series_mul(gk, series_pow(neg_g1, n - k, order=order), order=order)
        out = term if out is None else out + term
    return out


def _f_series(du, dxdu_col, k: int, order: int):
    r"""F_k(Delta) = <d0x (d0u)^k>_{b0+Delta} for a fixed column of dxdu."""
    a = _stack([_alt(p) * dxdu_col[k + p] for p in range(order + 1)])
    b = _den_series(du, order)
    return series_div(a, b, order=order)


def _dxdun_fixed_col(du, dxdu_col, n: int, order: int):
    r"""<(x - <x>(b))(u - <u>(b))^n> for a fixed (non-beta-dependent) x column."""
    g1 = _g_series(du, 1, order)
    neg_g1 = -g1
    f0 = _f_series(du, dxdu_col, 0, order)
    out = None
    for k in range(n + 1):
        gk = _g_series(du, k, order)
        fk = _f_series(du, dxdu_col, k, order)
        inner = fk - series_mul(f0, gk, order=order)
        term = comb(n, k) * series_mul(
            inner, series_pow(neg_g1, n - k, order=order), order=order
        )
        out = term if out is None else out + term
    return out


def dxdun_ave_coefs(du, dxdu, n: int, order: int, d: int | None = None):
    r"""Taylor coefs of <dx^{(d)}(b) du(b)^n>(b0+Delta).

    For beta-dependent x (``d`` given), ``x^{(d)}(b0+D) = sum_j D^j/j! x^{(d+j)}``
    adds a Cauchy convolution over the deriv index (dxdu[:, e] columns).
    """
    if d is None:
        return _dxdun_fixed_col(du, dxdu, n, order)

    # h^{(e)}[m] for e = d..d+order, then f[m] = sum_j h^{(d+j)}[m-j] / j!
    cols = {}
    for j in range(order + 1):
        e = d + j
        cols[e] = _dxdun_fixed_col(du, dxdu[:, e], n, order - j)
    rows = []
    for m in range(order + 1):
        rows.append(
            sum(
                (1.0 / math.factorial(j)) * cols[d + j][m - j] for j in range(m + 1)
            )
        )
    return _stack(rows)


# ---------------------------------------------------------------------------
# lnPi (reference /root/reference/src/thermoextrap/lnpi.py:42-116):
# d lnPi / d beta = mu.N - <u>(beta)  => integrate the u_ave series once.
# ---------------------------------------------------------------------------


def lnpi_coefs(u_ave_c, lnpi0, mudotn, order: int):
    r"""Taylor coefs of lnPi(b0+Delta) given coefs of <u>(b0+Delta) to order-1.

    ``c[0] = lnPi0``; ``c[m] = (mudotN delta_{m,1} - u_ave_c[m-1]) / m`` via
    term-by-term integration of ``(lnPi)' = mudotN - <u>``.
    """
    rows = [jnp.asarray(lnpi0) + 0.0 * u_ave_c[0]]
    for m in range(1, order + 1):
        val = -u_ave_c[m - 1] / m
        if m == 1:
            val = val + mudotn
        rows.append(val)
    return _stack(rows)


# ---------------------------------------------------------------------------
# Derivatives container (reference models.py:290-430)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Derivatives:
    """Wrap a coefficient function computing all derivatives to a given order.

    Parameters
    ----------
    coefs_fn :
        ``coefs_fn(args, order) -> (order+1, ...)`` normalized Taylor
        coefficients.  ``args`` is the ``derivs_args`` tuple of a data object.
    name :
        Human-readable tag of the observable.
    post_func :
        ``None``, ``"minus_log"``, ``"pow_<i>"`` or a callable applied to the
        coefficient series (reference SymDerivBase post_func,
        models.py:125-135 — applied to the generating function, which is the
        same as transforming the coefficient series).
    """

    coefs_fn: Callable[[tuple, int], Any]
    name: str = "custom"
    post_func: Any = None

    def __post_init__(self):
        # jit the full evaluation (coefs_fn + post transform); order is
        # static so each (order, shapes) pair compiles once.  Without this,
        # the unrolled series recursions dispatch hundreds of tiny eager ops
        # (painful on remote TPU backends).
        import jax

        object.__setattr__(
            self,
            "_jitted",
            jax.jit(
                lambda args, order, minus_log=False: (
                    series_neg_log(self._apply_post(self.coefs_fn(args, order)))
                    if minus_log
                    else self._apply_post(self.coefs_fn(args, order))
                ),
                static_argnums=(1, 2),
            ),
        )

    def _apply_post(self, c):
        pf = self.post_func
        if pf is None:
            return c
        if callable(pf):
            return pf(c)
        if pf == "minus_log":
            return series_neg_log(c)
        if isinstance(pf, str) and pf.startswith("pow_"):
            return series_pow(c, int(pf.split("_")[-1]), order=c.shape[0] - 1)
        msg = f"unknown post_func {pf!r}"
        raise ValueError(msg)

    def coefs(self, data=None, args=None, order=None, minus_log=False):
        """Normalized Taylor coefficients ``f^(n)/n!``, stacked on axis 0."""
        if data is not None:
            args = data.derivs_args
            if order is None:
                order = data.order
        if args is None or order is None:
            msg = "must specify (args and order) or data"
            raise ValueError(msg)
        # minus_log runs INSIDE the jitted program (static arg): the
        # series-log recursion is O(order^2) tiny ops — eager, that is
        # hundreds of remote dispatches on the TPU backend
        return self._jitted(tuple(args), int(order), bool(minus_log))

    def derivs(self, data=None, args=None, order=None, minus_log=False, norm=False):
        """Plain derivatives ``f^(n)`` (or coefficients if ``norm=True``)."""
        c = self.coefs(data=data, args=args, order=order, minus_log=minus_log)
        return c if norm else derivs_from_coefs(c)

    @classmethod
    def from_funcs(cls, funcs, name="custom"):
        """Build from an indexable of per-order derivative functions
        (reference ``Derivatives(funcs)`` style, used by the volume ensemble)."""

        def coefs_fn(args, order):
            rows = [
                funcs[i](*args) / math.factorial(i) for i in range(order + 1)
            ]
            return _stack(rows)

        return cls(coefs_fn=coefs_fn, name=name)

    @classmethod
    def from_sympy(cls, exprs, args, name="sympy"):
        """Migration seam for user-defined sympy observables
        (reference ``Derivatives.from_sympy``, models.py:404-421).

        ``exprs`` is indexable per derivative order (sympy expressions in
        indexed moment symbols, e.g. ``u[n]``, ``xu[n]``); ``args`` the
        corresponding sympy symbols.  Each order is lambdified to
        ``jax.numpy`` once (cached) — sympy runs at build time only.
        Indexed symbols index the moment arrays' leading axis, matching the
        ``derivs_args`` layout.
        """
        import sympy as sp

        cache: dict[int, Callable] = {}

        def fn(i: int) -> Callable:
            if i not in cache:
                cache[i] = sp.lambdify(tuple(args), exprs[i], modules="jax")
            return cache[i]

        def coefs_fn(call_args, order):
            rows = [
                fn(i)(*call_args) / math.factorial(i) for i in range(order + 1)
            ]
            return _stack(rows)

        return cls(coefs_fn=coefs_fn, name=name)
