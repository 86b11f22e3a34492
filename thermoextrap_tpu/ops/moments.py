r"""Weighted (co)moment reduction over the sample axis.

TPU-native replacement for the numba kernels of ``cmomy`` used throughout the
reference data layer (usage tally in /root/reference/src/thermoextrap/data.py:
485-534, 1028-1054, 1183-1203, 1344-1366, 1632-1640, 1803-1812).

Design (see SURVEY.md §7 M0): the reduction is cast as a matrix product so it
rides the MXU —

    ``xu[n, v] = (powers-of-u  [R, order+1])^T  @  (w * x  [R, V]) / sum(w)``

For numerical robustness the central path is *two-pass*: pass 1 computes the
weighted means, pass 2 accumulates moments of the exactly-centered samples.
Central moments are shift-invariant, so this is exact and avoids the
catastrophic cancellation of a raw-moment accumulate + binomial transform.

Layouts
-------
``uv``     : ``(*batch, R)``           energy (or virial) samples
``xv``     : ``(*batch, R, *val)``     observable samples, ``val_ndim`` trailing axes
``weight`` : broadcastable to ``uv`` or ``None``
returns moment arrays with the moment order on the **leading** axis
(``u: (order+1, *batch)``, ``xu: (order+1, *batch, *val)``).

The fused single-pass Pallas kernel (ops/moments_pallas.py) implements the
same contracts for the flat ``batch=()`` hot path.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "reduce_central_comoments",
    "reduce_raw_comoments",
    "u_power_stack",
]


def u_power_stack(uv, order: int):
    """Stack ``[u^0, ..., u^order]`` on a new trailing axis: ``(*batch, R, order+1)``."""
    out = [jnp.ones_like(uv)]
    for _ in range(order):
        out.append(out[-1] * uv)
    return jnp.stack(out, axis=-1)


def _normalize_weight(uv, weight):
    if weight is None:
        return jnp.ones_like(uv)
    return jnp.broadcast_to(jnp.asarray(weight, dtype=uv.dtype), uv.shape)


def _expand_val(a, val_ndim: int):
    """Append ``val_ndim`` singleton axes."""
    return a.reshape(a.shape + (1,) * val_ndim)


def reduce_raw_comoments(uv, xv, order: int, weight=None, val_ndim: int = 1):
    r"""Raw comoment reduction.

    Returns ``(u, xu)``:
      - ``u[n]  = <w u^n> / <w>``  with shape ``(order+1, *batch)``
      - ``xu[n] = <w x u^n> / <w>`` with shape ``(order+1, *batch, *val)``

    Mirrors ``build_aves_xu`` (/root/reference/src/thermoextrap/data.py:455-493).
    """
    uv = jnp.asarray(uv)
    xv = jnp.asarray(xv)
    w = _normalize_weight(uv, weight)
    batch = uv.shape[:-1]
    nrec = uv.shape[-1]
    val_shape = xv.shape[len(batch) + 1 :]
    if val_ndim != len(val_shape):
        msg = f"{val_ndim=} inconsistent with xv shape {xv.shape} and batch {batch}"
        raise ValueError(msg)

    wsum = w.sum(axis=-1)
    powers = u_power_stack(uv, order) * w[..., None]  # (*batch, R, order+1)

    # u moments: contract over R
    u = jnp.einsum("...rn->...n", powers) / wsum[..., None]

    # xu moments: batched matmul (order+1, R) @ (R, V) on the MXU
    xflat = xv.reshape(batch + (nrec, -1))
    xu = jnp.einsum(
        "...rn,...rv->...nv",
        powers,
        xflat,
        preferred_element_type=powers.dtype,
    ) / _expand_val(wsum, 2)
    xu = xu.reshape(batch + (order + 1,) + val_shape)

    # moment order to the leading axis
    nb = len(batch)
    u = jnp.moveaxis(u, -1, 0)
    xu = jnp.moveaxis(xu, nb, 0)
    return u, xu


def reduce_central_comoments(uv, xv, order: int, weight=None, val_ndim: int = 1):
    r"""Two-pass central comoment reduction.

    Returns ``(xave, uave, du, dxdu)``:
      - ``xave = <w x>/<w>``          shape ``(*batch, *val)``
      - ``uave = <w u>/<w>``          shape ``(*batch,)``
      - ``du[n]  = <w (u-uave)^n>/<w>``   shape ``(order+1, *batch)``,
        with ``du[0]=1, du[1]=0`` exactly
      - ``dxdu[n] = <w (x-xave)(u-uave)^n>/<w>`` shape ``(order+1, *batch, *val)``,
        with ``dxdu[0]=0`` exactly

    Mirrors ``build_aves_dxdu`` (/root/reference/src/thermoextrap/data.py:496-536).
    """
    uv = jnp.asarray(uv)
    xv = jnp.asarray(xv)
    w = _normalize_weight(uv, weight)
    batch = uv.shape[:-1]
    nrec = uv.shape[-1]
    val_shape = xv.shape[len(batch) + 1 :]
    if val_ndim != len(val_shape):
        msg = f"{val_ndim=} inconsistent with xv shape {xv.shape} and batch {batch}"
        raise ValueError(msg)

    wsum = w.sum(axis=-1)
    uave = (w * uv).sum(axis=-1) / wsum
    xflat = xv.reshape(batch + (nrec, -1))
    w_v = w[..., None]
    xave = (w_v * xflat).sum(axis=-2) / wsum[..., None]

    # pass 2: moments of centered samples
    du_v = uv - uave[..., None]
    dx_v = xflat - xave[..., None, :]

    powers = u_power_stack(du_v, order) * w[..., None]
    du = jnp.einsum("...rn->...n", powers) / wsum[..., None]
    dxdu = jnp.einsum(
        "...rn,...rv->...nv",
        powers,
        dx_v,
        preferred_element_type=powers.dtype,
    ) / _expand_val(wsum, 2)

    nb = len(batch)
    du = jnp.moveaxis(du, -1, 0)
    dxdu = jnp.moveaxis(dxdu, nb, 0)
    du = du.at[0].set(1.0).at[1].set(0.0)
    dxdu = dxdu.at[0].set(0.0)

    xave = xave.reshape(batch + val_shape)
    dxdu = dxdu.reshape((order + 1,) + batch + val_shape)
    return xave, uave, du, dxdu
