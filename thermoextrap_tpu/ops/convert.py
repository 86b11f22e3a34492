r"""Moment-type conversions (raw ↔ central, shifted raw) as closed-form
binomial transforms.

TPU-native replacement for the ``cmomy.convert`` / ``select_moment`` /
``assign_moment`` usage in the reference data layer
(/root/reference/src/thermoextrap/data.py:485-534, 844-909, 1062-1126).
All loops run over the static moment order at trace time.

Layout convention: moment arrays carry the moment order on the *leading*
axis, ``m[n] = n``-th moment, with arbitrary broadcastable batch axes behind.
"""

from __future__ import annotations

from math import comb

import jax.numpy as jnp
import numpy as np

__all__ = [
    "central_comoments_from_raw",
    "central_from_raw",
    "raw_from_central",
    "shift_raw_moments",
    "shift_raw_comoments",
    "u_from_xu_when_x_is_u",
]


def _powers(base, order: int, xp=jnp):
    """[base**0, ..., base**order] stacked on a new leading axis."""
    out = [xp.ones_like(base)]
    for _ in range(order):
        out.append(out[-1] * base)
    return out


def shift_raw_moments(u, delta, xp=jnp):
    r"""Shift raw moments: given ``u[k] = <(y)^k>`` return ``<(y - delta)^n>``.

    ``out[n] = sum_k C(n,k) u[k] (-delta)^{n-k}``.  Pass ``xp=numpy`` to run
    in host f64 regardless of the jax x64 flag (constructor-time conversions
    of large raw moments need f64 to avoid catastrophic cancellation).
    """
    order = u.shape[0] - 1
    d = _powers(-delta, order, xp=xp)
    return xp.stack(
        [
            sum(comb(n, k) * u[k] * d[n - k] for k in range(n + 1))
            for n in range(order + 1)
        ],
        axis=0,
    )


def shift_raw_comoments(xu, delta, xp=jnp):
    r"""Shift the u-argument of raw comoments ``xu[k] = <x y^k>`` by ``delta``:
    ``out[n] = <x (y - delta)^n> = sum_k C(n,k) xu[k] (-delta)^{n-k}``.

    The binomial transform is identical to :func:`shift_raw_moments`
    applied row-wise (the x factor rides along untouched) — one
    implementation, two documented contracts.
    """
    return shift_raw_moments(xu, delta, xp=xp)


def central_from_raw(u, xp=jnp):
    r"""Raw → central moments of ``u``.

    ``u[k] = <u^k>`` (``u[0]=1``) → ``du[n] = <(u - <u>)^n>``; output has
    ``du[0]=1`` and ``du[1]=0`` exactly (reference convention, see
    du_func.eval in /root/reference/src/thermoextrap/beta.py:56-66).
    """
    du = shift_raw_moments(u, u[1], xp=xp)
    if xp is np:
        du[0] = 1.0
        du[1] = 0.0
        return du
    return du.at[0].set(1.0).at[1].set(0.0)


def raw_from_central(du, mean, xp=jnp):
    r"""Central → raw: ``u[n] = sum_k C(n,k) du[k] mean^{n-k}``.

    ``du`` uses the ``du[0]=1, du[1]=0`` convention.
    """
    order = du.shape[0] - 1
    m = _powers(mean, order, xp=xp)
    return xp.stack(
        [
            sum(comb(n, k) * du[k] * m[n - k] for k in range(n + 1))
            for n in range(order + 1)
        ],
        axis=0,
    )


def central_comoments_from_raw(u, xu, xp=jnp):
    r"""Raw comoments → central comoments.

    Inputs ``u[k] = <u^k>``, ``xu[k] = <x u^k>``; returns
    ``(xave, du, dxdu)`` with ``dxdu[n] = <(x - <x>)(u - <u>)^n>``,
    ``dxdu[0] = 0`` exactly.
    """
    xave = xu[0]
    du = central_from_raw(u, xp=xp)
    # <x (u - m)^n> then subtract xave * <(u - m)^n>
    x_du = shift_raw_comoments(xu, u[1], xp=xp)
    du_full = shift_raw_moments(u, u[1], xp=xp)  # keep true values at n=0,1
    dxdu = x_du - xave * du_full
    if xp is np:
        dxdu[0] = 0.0
        return xave, du, dxdu
    return xave, du, dxdu.at[0].set(0.0)


def u_from_xu_when_x_is_u(xu, fill0=1.0):
    r"""The ``x_is_u`` shift trick (/root/reference/src/thermoextrap/data.py:539-546):
    when ``x == u``, ``xu[n] = u[n+1]``, so build ``u`` from ``xu`` by shifting
    the moment axis up one and setting ``u[0] = fill0`` (1 for raw moments; for
    central moments ``du[0]=1`` and the shifted value at index 1 is already 0).
    Output has one more moment entry than the input (order+2).
    """
    pad = jnp.full_like(xu[:1], fill0)
    return jnp.concatenate([pad, xu], axis=0)


def _pad_trailing(a, ndim: int):
    """Append singleton axes until ``a.ndim == ndim`` (trailing-val pads)."""
    return a.reshape(a.shape + (1,) * (ndim - a.ndim)) if a.ndim < ndim else a


def merge_central_comoments(xave, uave, du, dxdu, wsum, axis: int = 0):
    r"""Merge independent central comoment sets along ONE batch axis
    (reference ``DataCentralMoments.reduce``, data.py:973-998), keeping any
    remaining batch axes (e.g. a macrostate grid) intact.

    Strategy: shift every set's raw moments about the pooled means (exact,
    one weighted average), then the merged central moments are the weighted
    mean of the shifted contributions — the same exact merge rule used by
    the sharded reduction (parallel/sharded.py).

    Shapes (axis=0 after normalization; ``*b`` = surviving batch axes):
    ``xave (B, *b, *val)``, ``uave (B, *b)``, ``du (order+1, B, *b, 1...)``,
    ``dxdu (order+1, B, *b, *val)``, ``wsum (B, *b)``.  Returns the same
    tuple with the merged axis reduced away.
    """
    # normalize: merged axis at 0 of the means/weights, 1 of the moments
    # (negative axis must be resolved against the MEANS' rank before the
    # +1 offset below, or it would index from the moment axis instead)
    axis = int(axis) % max(jnp.ndim(uave), 1)
    uave = jnp.moveaxis(uave, axis, 0)
    wsum = jnp.moveaxis(wsum, axis, 0)
    xave = jnp.moveaxis(xave, axis, 0)
    dxdu = jnp.moveaxis(dxdu, axis + 1, 1)
    du = _pad_trailing(jnp.moveaxis(du, axis + 1, 1), dxdu.ndim)

    order = du.shape[0] - 1
    wtot = wsum.sum(axis=0)  # (*b,)
    w = wsum / wtot
    # ZERO-WEIGHT MEMBERS CONTRIBUTE NOTHING — and must not poison the
    # pool: an empty accumulator state carries uave=0 (so delta_u**order
    # can overflow f32 to inf for large-mean streams) and an all-zero-
    # weight chunk carries 0/0=NaN stats; 0 * inf and 0 * NaN are both
    # NaN, so every weighted contribution is masked on w > 0 instead of
    # relying on the multiply.
    w_m = jnp.where(w > 0, w, 0.0)
    u_pool = jnp.where(w > 0, w * uave, 0.0).sum(axis=0)  # (*b,)
    w_x = _pad_trailing(w_m, xave.ndim)
    x_pool = jnp.where(w_x > 0, w_x * xave, 0.0).sum(axis=0)  # (*b, *val)

    # raw moments of each set about the pooled u mean:
    # <(u - u_pool)^n>_b = sum_k C(n,k) du_b[k] (uave_b - u_pool)^{n-k}
    delta_u = uave - u_pool  # (B, *b)
    shifted_u = raw_from_central(du, _pad_trailing(delta_u, du.ndim - 1))

    # comoments of (x - x_pool) about the pooled u mean:
    # <(x - x_pool)(u - u_pool)^n>_b
    #   = sum_k C(n,k) (dxdu_b[k] + dxb * du_b[k]) * delta_u^{n-k},
    # with dxb = xave_b - x_pool
    dxb = xave - x_pool  # (B, *b, *val)
    base = dxdu + dxb[None] * du
    d = _powers(_pad_trailing(delta_u, dxdu.ndim - 1), order)
    shifted_xu = jnp.stack(
        [
            sum(comb(n, k) * base[k] * d[n - k] for k in range(n + 1))
            for n in range(order + 1)
        ],
        axis=0,
    )

    w_u = _pad_trailing(w_m, shifted_u.ndim - 1)
    w_xu = _pad_trailing(w_m, shifted_xu.ndim - 1)
    du_m = jnp.where(w_u > 0, w_u * shifted_u, 0.0).sum(axis=1)
    dxdu_m = jnp.where(w_xu > 0, w_xu * shifted_xu, 0.0).sum(axis=1)
    du_m = du_m.at[0].set(1.0).at[1].set(0.0)
    dxdu_m = dxdu_m.at[0].set(0.0)
    return x_pool, u_pool, du_m, dxdu_m, wtot
