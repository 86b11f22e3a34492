r"""Data layer: sample values and (co)moment containers.

TPU-native redesign of /root/reference/src/thermoextrap/data.py (1813 LoC).
The reference's four xarray/attrs classes collapse to two pytree dataclasses:

- :class:`DataValues` — backed by raw timeseries ``uv, xv``; computes raw or
  central comoments lazily (covers reference ``DataValues``,
  ``DataValuesCentral``, ``DataCentralMomentsVals``).
- :class:`DataCentralMoments` — backed by a pre-reduced central comoment
  tensor (covers reference ``DataCentralMoments`` and all of its
  ``from_*`` constructors).

Named-dims contract of the reference (data.py:1-12) becomes a positional
layout convention:

- ``uv``: ``(*batch, rec)`` — energy-like samples; ``batch`` usually empty
  or ``(rep,)`` after bootstrap.
- ``xv``: ``(*batch, rec, [deriv+1,] *val)`` — observable samples; the
  optional ``deriv`` axis holds explicit-beta-dependence derivatives
  ``x^{(d)}`` (reference ``deriv_dim``).

``derivs_args`` produces engine-ready arrays for
:mod:`thermoextrap_tpu.models.derivatives`:

- raw:      ``(u, xu)`` with ``u: (order+1, *batch, 1...)`` broadcast-padded,
  ``xu: (order+1, [deriv+1,] *batch, *val)``
- central:  ``(xave, du, dxdu)`` analogously; ``x_is_u`` drops the x entry
  (reference data.py:944-962).

A ``meta`` callback (reference ``DataCallbackABC``, data.py:165-250) may
append ensemble-specific extra args (volume, lnPi).
"""

from __future__ import annotations

from functools import cached_property
from typing import Any

import jax
import jax.numpy as jnp

from .ops.convert import (
    central_comoments_from_raw,
    central_from_raw,
    merge_central_comoments,
    raw_from_central,
    u_from_xu_when_x_is_u,
)
from .ops import dispatch
from .ops.resample import (
    freq_from_indices,
    random_indices,
    resample_values,
)
from .utils.random import validate_rng
from .utils.trees import pytree_dataclass, replace

__all__ = [
    "DataCallback",
    "DataCallbackABC",
    "DataCentralMoments",
    "DataCentralMomentsVals",
    "DataValues",
    "DataValuesCentral",
    "factory_data_values",
]


# ---------------------------------------------------------------------------
# meta callbacks (reference data.py:165-250)
# ---------------------------------------------------------------------------


class DataCallbackABC:
    """Metadata hook: validate, extend ``derivs_args``, follow resampling."""

    def check(self, data) -> None:  # pragma: no cover - interface
        pass

    def derivs_args(self, data, derivs_args: tuple) -> tuple:
        return tuple(derivs_args)

    def resample(self, data, *, indices=None, freq=None, **kws):
        return self

    def reduce(self, data, **kws):
        return self


class DataCallback(DataCallbackABC):
    """Pass-through default callback.

    Stateless, so it is registered as a *static* pytree node: data objects
    carrying the default callback are fully jit-traceable (e.g. as a
    ``lax.scan`` carry in the streaming-accumulation path,
    :meth:`DataCentralMoments.push_vals`).  Instances compare equal by type
    so independently-built data objects share one treedef.
    """

    def __eq__(self, other) -> bool:
        # by-type equality keeps treedefs shared across instances AND stays
        # reflexive under stateless subclasses (a subclass instance must
        # equal its own kind, not DataCallback)
        return type(other) is type(self)

    def __hash__(self) -> int:
        return hash(type(self))


jax.tree_util.register_static(DataCallback)


def _pad_val(a, val_ndim: int):
    """Append singleton axes so u-moments broadcast against x-moments."""
    return a.reshape(a.shape + (1,) * val_ndim) if val_ndim else a


def _normalize_sampler(sampler, nrec: int, rng=None):
    """Accept ``{"nrep": R}`` mappings, ``{"indices": ...}``, ``{"freq": ...}``,
    or a bare index array (reference ``cmomy.factory_sampler`` seam,
    data.py:420-426).  Returns ``(indices_or_None, freq)``.
    """
    if isinstance(sampler, dict):
        if "freq" in sampler:
            return sampler.get("indices"), jnp.asarray(sampler["freq"])
        if "indices" in sampler:
            indices = jnp.asarray(sampler["indices"])
        else:
            key = validate_rng(sampler.get("rng", rng))
            indices = random_indices(key, sampler["nrep"], nrec)
        return indices, freq_from_indices(indices, nrec)
    indices = jnp.asarray(sampler)
    if indices.ndim != 2:
        msg = "sampler array must be 2d bootstrap indices (nrep, nsamp)"
        raise ValueError(msg)
    return indices, freq_from_indices(indices, nrec)


# ---------------------------------------------------------------------------
# values-backed data
# ---------------------------------------------------------------------------


@pytree_dataclass(
    meta_fields=("order", "central", "x_is_u", "xalpha", "val_ndim")
)
class DataValues:
    """Raw timeseries container with lazy (co)moment accessors."""

    uv: jax.Array
    xv: jax.Array
    weight: jax.Array | None
    meta: Any
    order: int
    central: bool
    x_is_u: bool
    xalpha: bool
    val_ndim: int

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_vals(
        cls,
        xv,
        uv,
        order: int,
        *,
        weight=None,
        central: bool = False,
        xalpha: bool = False,
        x_is_u: bool = False,
        val_ndim: int | None = None,
        meta: DataCallbackABC | None = None,
    ):
        uv = jnp.asarray(uv)
        if xv is None:
            x_is_u = True
        xv = uv if x_is_u else jnp.asarray(xv)
        nb = uv.ndim - 1  # batch dims
        if val_ndim is None:
            val_ndim = xv.ndim - nb - 1 - (1 if xalpha else 0)
        if val_ndim < 0:
            msg = f"bad shapes: uv {uv.shape}, xv {xv.shape}, {xalpha=}"
            raise ValueError(msg)
        obj = cls(
            uv=uv,
            xv=xv,
            weight=None if weight is None else jnp.asarray(weight),
            meta=meta if meta is not None else DataCallback(),
            order=int(order),
            central=bool(central),
            x_is_u=bool(x_is_u),
            xalpha=bool(xalpha),
            val_ndim=int(val_ndim),
        )
        obj.meta.check(obj)
        return obj

    # -- basic properties ---------------------------------------------------

    def __len__(self) -> int:
        return self.uv.shape[-1]

    @property
    def nbatch(self) -> int:
        return self.uv.ndim - 1

    @property
    def _xval_ndim(self) -> int:
        """val axes of xv including the deriv axis."""
        return self.val_ndim + (1 if self.xalpha else 0)

    # -- moment accessors ----------------------------------------------------

    @cached_property
    def _raw(self):
        return dispatch.reduce_raw(
            self.uv, self.xv, self.order, weight=self.weight,
            val_ndim=self._xval_ndim,
        )

    @cached_property
    def _central(self):
        # x_is_u threaded explicitly: the dispatch identity check (xv is
        # uv) fails once this object flows through jit/vmap (distinct
        # tracers), which would double the stream traffic on TPU
        return dispatch.reduce_central(
            self.uv, self.xv, self.order, weight=self.weight,
            val_ndim=self._xval_ndim, x_is_u=self.x_is_u,
        )

    def _move_deriv(self, a, has_mom_axis: bool = True):
        """Move the deriv axis (stored after batch) to just behind the moment axis."""
        if not self.xalpha:
            return a
        src = (1 if has_mom_axis else 0) + self.nbatch
        return jnp.moveaxis(a, src, 1 if has_mom_axis else 0)

    @cached_property
    def xu(self):
        """Raw comoments ``<x^{(d)} u^n>``: ``(order+1, [deriv+1,] *batch, *val)``."""
        return self._move_deriv(self._raw[1])

    @cached_property
    def u(self):
        """Raw u-moments, broadcast-padded: ``(order+1|+2, *batch, 1...)``."""
        if self.x_is_u:
            return u_from_xu_when_x_is_u(self._raw[1])
        return _pad_val(self._raw[0], self.val_ndim)

    @cached_property
    def xave(self):
        """``<x^{(d)}>``: ``([deriv+1,] *batch, *val)``."""
        return self._move_deriv(self._central[0], has_mom_axis=False)

    @cached_property
    def uave(self):
        return self._central[1]

    @cached_property
    def dxdu(self):
        """Central comoments ``<dx^{(d)} du^n>``: ``(order+1, [deriv+1,] *batch, *val)``."""
        return self._move_deriv(self._central[3])

    @cached_property
    def du(self):
        """Central u-moments, padded: ``du[0]=1, du[1]=0``."""
        if self.x_is_u:
            return u_from_xu_when_x_is_u(self._central[3], fill0=1.0)
        return _pad_val(self._central[2], self.val_ndim)

    @property
    def derivs_args(self) -> tuple:
        if self.central:
            if self.x_is_u:
                out = (self.uave, self.du)
            else:
                out = (self.xave, self.du, self.dxdu)
        elif self.x_is_u:
            out = (self.u,)
        else:
            out = (self.u, self.xu)
        return self.meta.derivs_args(self, out)

    # -- resampling (reference data.py:403-449, 1750-1813) -------------------

    def resample(self, sampler, *, rng=None, **kws):
        """Bootstrap: returns a new object whose values have a leading rep axis."""
        if self.nbatch:
            msg = "resample of already-replicated data is not supported"
            raise NotImplementedError(msg)
        indices, _freq = _normalize_sampler(sampler, len(self), rng=rng)
        if indices is None:
            msg = "DataValues.resample needs index-style sampler"
            raise ValueError(msg)
        uv = resample_values(self.uv, indices, rec_axis=0)
        xv = uv if self.x_is_u else resample_values(self.xv, indices, rec_axis=0)
        weight = (
            None
            if self.weight is None
            else resample_values(
                jnp.broadcast_to(self.weight, self.uv.shape), indices, rec_axis=0
            )
        )
        meta = self.meta.resample(self, indices=indices, freq=_freq, **kws)
        return replace(self, uv=uv, xv=xv, weight=weight, meta=meta)


class DataValuesCentral(DataValues):
    """Alias constructor: values-backed data using central moments
    (reference ``DataValuesCentral``)."""

    @classmethod
    def from_vals(cls, xv, uv, order, **kws):
        kws.setdefault("central", True)
        return super().from_vals(xv, uv, order, **kws)


# ---------------------------------------------------------------------------
# moment-backed data (reference DataCentralMoments, data.py:791-1618)
# ---------------------------------------------------------------------------


@pytree_dataclass(meta_fields=("order", "central", "x_is_u", "xalpha", "val_ndim"))
class DataCentralMoments:
    """Pre-reduced central comoment container.

    Fields hold the canonical central representation (means + central
    comoments + weight); raw views are derived by binomial transforms.
    Shapes: ``xave ([deriv+1,] *batch, *val)``, ``du (order+1, *batch, 1...)``,
    ``dxdu (order+1, [deriv+1,] *batch, *val)``, ``uave (*batch,)``,
    ``wsum (*batch,)``.
    """

    xave: jax.Array
    uave: jax.Array
    du: jax.Array
    dxdu: jax.Array
    wsum: jax.Array
    meta: Any
    order: int
    central: bool
    x_is_u: bool
    xalpha: bool
    val_ndim: int

    # -- constructors (reference data.py:1062-1618) ---------------------------

    @classmethod
    def from_vals(
        cls,
        xv,
        uv,
        order: int,
        *,
        weight=None,
        central: bool = True,
        xalpha: bool = False,
        x_is_u: bool = False,
        meta: DataCallbackABC | None = None,
    ):
        if xv is None:  # mirror DataValues.from_vals (reference data.py:376)
            x_is_u = True
        dv = DataValues.from_vals(
            xv, uv, order, weight=weight, central=True, xalpha=xalpha,
            x_is_u=x_is_u, meta=meta,
        )
        xave, uave, du, dxdu = dv._central
        w = dv.weight
        # weights never drop below f32: a bf16 sample stream must not
        # quantize the sample COUNT (8-bit mantissa) — matches the kernel
        # convention (ops/dispatch.py keeps weight streams f32)
        wdtype = jnp.promote_types(dv.uv.dtype, jnp.float32)
        wsum = (
            # the sample count as a dim expression, not float(): the rec
            # dim may be SYMBOLIC under shape-polymorphic AOT export
            jnp.full(dv.uv.shape[:-1], dv.uv.shape[-1], dtype=wdtype)
            if w is None
            else jnp.broadcast_to(jnp.asarray(w, wdtype), dv.uv.shape).sum(-1)
        )
        return cls(
            xave=dv._move_deriv(xave, has_mom_axis=False),
            uave=uave,
            du=_pad_val(du, dv.val_ndim),
            dxdu=dv._move_deriv(dxdu),
            wsum=jnp.asarray(wsum, dtype=wdtype),
            meta=dv.meta,
            order=int(order),
            central=bool(central),
            x_is_u=bool(x_is_u),
            xalpha=bool(xalpha),
            val_ndim=dv.val_ndim,
        )

    @classmethod
    def from_ave_central(
        cls,
        xave,
        uave,
        du,
        dxdu,
        *,
        wsum=None,
        central: bool = True,
        xalpha: bool = False,
        x_is_u: bool = False,
        val_ndim: int | None = None,
        meta: DataCallbackABC | None = None,
    ):
        du = jnp.asarray(du)
        dxdu = jnp.asarray(dxdu)
        xave = jnp.asarray(xave)
        uave = jnp.asarray(uave)
        order = dxdu.shape[0] - 1
        if val_ndim is None:
            val_ndim = dxdu.ndim - 1 - (1 if xalpha else 0) - uave.ndim
        # normalize du to the canonical pad convention — (order+1, *batch)
        # + val pads, deriv axis broadcast — whatever singleton layout the
        # caller handed in (u-moments never vary along val/deriv axes, so
        # every non-(moment, batch) axis must be a singleton; a non-
        # singleton one errors here, loudly)
        du = du.reshape((order + 1, *uave.shape) + (1,) * int(val_ndim))
        return cls(
            xave=xave,
            uave=uave,
            du=du.at[0].set(1.0).at[1].set(0.0) if du.shape[0] > 1 else du,
            dxdu=dxdu.at[0].set(0.0),
            wsum=jnp.ones_like(uave) if wsum is None else jnp.asarray(wsum),
            meta=meta if meta is not None else DataCallback(),
            order=int(order),
            central=bool(central),
            x_is_u=bool(x_is_u),
            xalpha=bool(xalpha),
            val_ndim=int(val_ndim),
        )

    @classmethod
    def from_raw(
        cls,
        u,
        xu=None,
        *,
        wsum=None,
        central: bool = False,
        xalpha: bool = False,
        x_is_u: bool = False,
        val_ndim: int | None = None,
        meta: DataCallbackABC | None = None,
    ):
        """From raw moments ``u[n]=<u^n>`` (n=0..K, moment axis leading; must
        include ``u[0]=1``), ``xu[n]=<x u^n>``.

        With ``x_is_u=True`` pass ``xu=None``: ``xu[n] = u[n+1]`` by the shift
        trick and ``order = K-1`` (reference ``from_raw`` / ``from_ave_raw``,
        data.py:1062-1126, 1394-1473).
        """
        # conversions of raw moments run in host f64 regardless of the jax
        # x64 flag: large raw energy moments cancel catastrophically in f32
        import numpy as _np

        u = _np.asarray(u, dtype=_np.float64)
        if x_is_u or xu is None:
            x_is_u = True
            du_full = jnp.asarray(central_from_raw(u, xp=_np))  # K+1 entries
            uave = jnp.asarray(u[1])
            order = int(u.shape[0] - 2)
            return cls(
                xave=uave,
                uave=uave,
                du=du_full[: order + 1],
                dxdu=du_full[1:],  # <du du^n> = du[n+1], n = 0..order
                wsum=jnp.ones_like(uave) if wsum is None else jnp.asarray(wsum),
                meta=meta if meta is not None else DataCallback(),
                order=order,
                central=bool(central),
                x_is_u=True,
                xalpha=False,
                val_ndim=0 if val_ndim is None else int(val_ndim),
            )
        xu = _np.asarray(xu, dtype=_np.float64)
        if val_ndim is None:
            val_ndim = xu.ndim - u.ndim - (1 if xalpha else 0)
        u_b = _pad_val(u, xu.ndim - u.ndim)
        xave_f, du, dxdu = central_comoments_from_raw(u_b, xu, xp=_np)
        xave_f, du, dxdu = (jnp.asarray(a) for a in (xave_f, du, dxdu))
        uave = jnp.asarray(u[1])
        return cls(
            xave=xave_f,
            uave=uave,
            du=du,
            dxdu=dxdu,
            wsum=jnp.ones_like(uave) if wsum is None else jnp.asarray(wsum),
            meta=meta if meta is not None else DataCallback(),
            order=int(u.shape[0] - 1),
            central=bool(central),
            x_is_u=bool(x_is_u),
            xalpha=bool(xalpha),
            val_ndim=int(val_ndim),
        )

    # reference alias (data.py:1394-1473): same contract with moment axis leading
    from_ave_raw = from_raw

    @classmethod
    def from_data(
        cls,
        data,
        *,
        central: bool = False,
        x_is_u: bool = False,
        xalpha: bool = False,
        val_ndim: int = 0,
        meta: DataCallbackABC | None = None,
    ):
        """Migration-parity constructor from a pre-assembled cmomy-layout
        central (co)moment tensor with TRAILING moment axes (reference
        ``DataCentralMoments.from_data``, data.py:1216-1283):

        - ``x_is_u=False``: ``data (*batch, *val, 2, order+1)`` with
          ``data[..., 0, 0] = weight``, ``data[..., 1, 0] = <x>``,
          ``data[..., 0, 1] = <u>``, ``data[..., 0, j>=2] = <du^j>``,
          ``data[..., 1, j>=1] = <dx du^j>``.
        - ``x_is_u=True``: ``data (*batch, K+1)`` u-moment array
          ``[w, <u>, <du^2>, ...]`` treated as comoments of x=u with
          ``order = K - 1`` (the reference's ``moments_to_comoments``
          shift, cmomy role).

        ``val_ndim`` counts trailing value axes of the batch part; the
        u-moment slices must be constant along them (as any tensor built by
        a (co)moment reduction is) — they are read at val index 0.

        Examples
        --------
        >>> import numpy as np
        >>> d = DataCentralMoments.from_data(
        ...     np.array([10.0, 2.0, 0.5, 0.1]), x_is_u=True, central=True
        ... )  # [w, <u>, <du^2>, <du^3>] -> order 2
        >>> d.order
        2
        >>> float(d.uave), [float(v) for v in d.du]
        (2.0, [1.0, 0.0, 0.5])
        """
        import numpy as _np

        data = _np.asarray(data, dtype=_np.float64)
        if xalpha:
            msg = "from_data with a deriv axis is not supported; use from_ave_central"
            raise NotImplementedError(msg)
        if x_is_u:
            order = int(data.shape[-1] - 2)
            if order < 0:
                msg = f"x_is_u data needs >= 2 moment entries, got {data.shape}"
                raise ValueError(msg)
            du_full = _np.moveaxis(data, -1, 0).copy()  # (K+1, *batch)
            wsum = jnp.asarray(du_full[0])
            uave = jnp.asarray(du_full[1])
            du_full[0] = 1.0
            du_full[1] = 0.0
            du_full = jnp.asarray(du_full)
            return cls(
                xave=uave,
                uave=uave,
                du=du_full[: order + 1],
                dxdu=du_full[1:],  # <du du^n> = du[n+1]
                wsum=wsum,
                meta=meta if meta is not None else DataCallback(),
                order=order,
                central=bool(central),
                x_is_u=True,
                xalpha=False,
                val_ndim=0,
            )
        if data.shape[-2] != 2:
            msg = f"expected trailing (xmom=2, umom) axes, got {data.shape}"
            raise ValueError(msg)
        order = int(data.shape[-1] - 1)
        idx0 = (Ellipsis, *(0,) * val_ndim) if val_ndim else (Ellipsis,)
        wsum = jnp.asarray(data[..., 0, 0][idx0])
        uave = jnp.asarray(data[..., 0, 1][idx0])
        xave = jnp.asarray(data[..., 1, 0])
        du = _np.moveaxis(data[..., 0, :], -1, 0)[
            (slice(None), *idx0)
        ].copy()  # (order+1, *batch)
        du[0] = 1.0
        if order >= 1:
            du[1] = 0.0
        dxdu = _np.moveaxis(data[..., 1, :], -1, 0).copy()
        dxdu[0] = 0.0
        return cls(
            xave=xave,
            uave=uave,
            du=_pad_val(jnp.asarray(du), val_ndim),
            dxdu=jnp.asarray(dxdu),
            wsum=wsum,
            meta=meta if meta is not None else DataCallback(),
            order=order,
            central=bool(central),
            x_is_u=False,
            xalpha=False,
            val_ndim=int(val_ndim),
        )

    @classmethod
    def from_resample_vals(
        cls,
        xv,
        uv,
        order: int,
        sampler,
        *,
        weight=None,
        central: bool = True,
        x_is_u: bool = False,
        xalpha: bool = False,
        rng=None,
        meta: DataCallbackABC | None = None,
    ):
        """Bootstrap directly into a replicated moment container
        (reference data.py:1285-1392).

        ``xalpha`` (deriv-axis) input — ``xv (rec, deriv+1, *val)`` — is
        supported: the derivative columns ride the freq-matmul reduction
        as extra value columns (one kernel pass), and the deriv axis is
        restored ahead of the replicate axis afterwards.
        """
        if xalpha and (x_is_u or xv is None):
            msg = (
                "from_resample_vals: xalpha needs an explicit "
                "xv (rec, deriv+1, *val); it is meaningless with x_is_u"
            )
            raise ValueError(msg)
        uv = jnp.asarray(uv)
        xv = uv if (x_is_u or xv is None) else jnp.asarray(xv)
        _indices, freq = _normalize_sampler(sampler, uv.shape[-1], rng=rng)
        val_shape = xv.shape[1:]  # includes the deriv axis when xalpha
        xflat = xv.reshape(uv.shape[-1], -1)
        xave, uave, du, dxdu = dispatch.resample_central(
            uv, xflat, freq, order, weight=weight
        )
        nrep = freq.shape[0]
        xave = xave.reshape((nrep, *val_shape))
        dxdu = dxdu.reshape((order + 1, nrep, *val_shape))
        if xalpha:
            # deriv axis ahead of the replicate batch axis (object layout)
            xave = jnp.moveaxis(xave, 1, 0)
            dxdu = jnp.moveaxis(dxdu, 2, 1)
            val_shape = val_shape[1:]
        w = jnp.ones_like(uv) if weight is None else jnp.broadcast_to(weight, uv.shape)
        wsum = freq.astype(uv.dtype) @ w
        obj = cls(
            xave=xave,
            uave=uave,
            du=_pad_val(du, len(val_shape)),
            dxdu=dxdu,
            wsum=wsum,
            meta=meta if meta is not None else DataCallback(),
            order=int(order),
            central=bool(central),
            x_is_u=bool(x_is_u),
            xalpha=bool(xalpha),
            val_ndim=len(val_shape),
        )
        if meta is not None:
            obj = replace(obj, meta=meta.resample(obj, indices=_indices, freq=freq))
        return obj

    # -- views ----------------------------------------------------------------

    def __len__(self) -> int:
        return int(self.wsum if self.wsum.ndim == 0 else self.wsum.reshape(-1)[0])

    @property
    def _du_norm(self):
        """``du`` in the canonical pad convention — ``(order+1, *batch)``
        + val pads, deriv axis broadcast — regardless of which constructor
        built the state (all non-(moment, batch) axes are singletons)."""
        return self.du.reshape(
            (self.order + 1, *self.wsum.shape) + (1,) * self.val_ndim
        )

    @cached_property
    def u(self):
        """Raw u-moments from the central representation (padded)."""
        if self.x_is_u:
            # reference shift trick: u from xu = central->raw on x=u comoments
            return u_from_xu_when_x_is_u(self.xu)
        du = self._du_norm
        return raw_from_central(
            du, _pad_val(self.uave, du.ndim - 1 - self.uave.ndim)
        )

    @cached_property
    def xu(self):
        """Raw comoments ``<x u^n>`` = ``xave * u + shift(dxdu)``."""
        du_b = self._du_norm  # canonical pads: the deriv insert below
        uave_b = _pad_val(self.uave, du_b.ndim - 1 - self.uave.ndim)
        u_b = raw_from_central(du_b, uave_b)
        # <x u^n> = <(xave + dx)(uave + du)^n>
        #         = xave <u^n> + sum_k C(n,k) uave^{n-k} <dx du^k>
        from math import comb as _comb  # local to keep namespace tidy

        order = self.order
        dxdu = self.dxdu
        if self.xalpha:
            u_b = u_b[:, None]
            uave_p = uave_b[None]
            xave = self.xave
        else:
            uave_p = uave_b
            xave = self.xave
        pw = [jnp.ones_like(uave_p)]
        for _ in range(order):
            pw.append(pw[-1] * uave_p)
        rows = []
        for n in range(order + 1):
            s = xave * u_b[n]
            for k in range(1, n + 1):
                s = s + _comb(n, k) * pw[n - k] * dxdu[k]
            rows.append(s)
        return jnp.stack(jnp.broadcast_arrays(*rows), axis=0)

    @property
    def du_x(self):
        """du with the x_is_u shift applied when needed."""
        if self.x_is_u:
            return u_from_xu_when_x_is_u(self.dxdu, fill0=1.0)
        return self.du

    def cmom(self):
        """cmomy-layout central comoment tensor with TRAILING moment axes —
        the exact inverse of :meth:`from_data` (reference
        ``DataCentralMomentsBase.cmom``, data.py:849-852).

        ``x_is_u=True`` → ``(*batch, order+2)`` u-moment vector
        ``[w, <u>, <du^2>, ...]``; else ``(*batch, *val, 2, order+1)`` with
        ``[..., 0, 0]=w``, ``[..., 0, 1]=<u>``, ``[..., 0, j>=2]=<du^j>``,
        ``[..., 1, 0]=<x>``, ``[..., 1, j>=1]=<dx du^j>``.
        """
        if self.xalpha:
            msg = "cmom with a deriv axis is not supported"
            raise NotImplementedError(msg)
        if self.x_is_u:
            full = self.du_x.at[0].set(self.wsum).at[1].set(self.uave)
            return jnp.moveaxis(full, 0, -1)
        b_val = self.dxdu.shape[1:]
        wsum_b = jnp.broadcast_to(_pad_val(self.wsum, self.val_ndim), b_val)
        uave_b = jnp.broadcast_to(_pad_val(self.uave, self.val_ndim), b_val)
        du_b = jnp.broadcast_to(self.du, (self.order + 1, *b_val))
        rows0 = [wsum_b] + ([uave_b] if self.order >= 1 else []) + list(du_b[2:])
        rows1 = [self.xave] + list(self.dxdu[1:])
        out = jnp.stack([jnp.stack(rows0), jnp.stack(rows1)])
        return jnp.moveaxis(out, (0, 1), (-2, -1))

    def rmom(self):
        """cmomy-layout RAW comoment tensor with trailing moment axes
        (reference ``DataCentralMomentsBase.rmom``, data.py:845-848):
        same shapes as :meth:`cmom` with ``[..., 0, j>=1]=<u^j>`` and
        ``[..., 1, j]=<x u^j>`` (weight still at ``[..., 0, 0]``)."""
        if self.xalpha:
            msg = "rmom with a deriv axis is not supported"
            raise NotImplementedError(msg)
        if self.x_is_u:
            return jnp.moveaxis(self.u.at[0].set(self.wsum), 0, -1)
        xu = self.xu
        b_val = xu.shape[1:]
        wsum_b = jnp.broadcast_to(_pad_val(self.wsum, self.val_ndim), b_val)
        row0 = jnp.broadcast_to(self.u, (self.order + 1, *b_val))
        row0 = jnp.concatenate([wsum_b[None], row0[1:]])
        out = jnp.stack([row0, xu])
        return jnp.moveaxis(out, (0, 1), (-2, -1))

    @property
    def derivs_args(self) -> tuple:
        if self.central:
            if self.x_is_u:
                out = (self.uave, self.du_x)
            else:
                out = (self.xave, self.du, self.dxdu)
        elif self.x_is_u:
            out = (self.u,)
        else:
            out = (self.u, self.xu)
        return self.meta.derivs_args(self, out)

    def _merge_along(self, wsum, axis: int):
        """The exact shifted-moment merge with the deriv axis (xalpha)
        riding as a trailing value axis: ``x^{(d)}`` is just another
        observable column to the merge algebra (the u-moment shift is
        shared), so a deriv-axis state pools/reweights identically to a
        vector observable — matching the reference's dim-generic cmomy
        reduction (reference data.py:973-998)."""
        if not self.xalpha:
            return merge_central_comoments(
                self.xave, self.uave, self.du, self.dxdu, wsum, axis=axis
            )
        x2 = jnp.moveaxis(self.xave, 0, -1)
        dxdu2 = jnp.moveaxis(self.dxdu, 1, -1)
        x_p, u_p, du_m, dxdu_m, w = merge_central_comoments(
            x2, self.uave, self.du, dxdu2, wsum, axis=axis
        )
        return (
            jnp.moveaxis(x_p, -1, 0),
            u_p,
            du_m[..., 0],  # strip the deriv-as-val singleton pad
            jnp.moveaxis(dxdu_m, -1, 1),
            w,
        )

    def reduce(self, axis: int = 0):
        """Merge the moment sets along ONE batch axis into a pooled set,
        keeping any remaining batch axes (reference
        ``DataCentralMoments.reduce``, data.py:973-998) — e.g. combine
        per-block or per-replicate moments from independent simulations.
        Exact (same merge rule as the sharded reduction); deriv-axis
        (xalpha) states merge the derivative columns as value columns."""
        xave, uave, du, dxdu, wsum = self._merge_along(self.wsum, axis)
        return replace(
            self, xave=xave, uave=uave, du=du, dxdu=dxdu, wsum=wsum,
            meta=self.meta.reduce(self),
        )

    def resample(self, sampler, *, axis: int = 0, rng=None, **kws):
        """Block bootstrap over PRE-REDUCED moment blocks along one batch
        axis (reference ``DataCentralMoments.resample`` via cmomy's
        ``resample_and_reduce``, reference data.py:1000-1055).

        Replicate ``r`` reweights block ``b`` by ``freq[r, b]`` and pools
        all blocks with the exact shifted-moment merge
        (:func:`merge_central_comoments` with ``wsum -> freq[r] * wsum``) —
        identical to re-reducing the concatenated resampled samples, but
        needing only the retained per-block moments (the samples can be
        gone).  When blocks partition one sample set and the value-level
        freq table repeats each block's count over its samples, this equals
        the values-path bootstrap exactly (the reference's shared-sampler
        consistency technique, reference tests/test_data.py:94; gated in
        tests/test_data.py).

        Parameters mirror the values paths: ``sampler`` is ``{"nrep": R}``
        / ``{"freq": ...}`` / ``{"indices": ...}`` / a bare index array over
        the **block** axis.  ``axis`` selects which batch axis holds the
        blocks.  Returns a new :class:`DataCentralMoments` whose leading
        batch axis is the replicate axis (remaining batch axes kept).
        """
        nb = self.wsum.ndim
        if nb == 0:
            msg = (
                "moment-backed resample needs a block batch axis; this state "
                "is a single pooled moment set (build per-block states, e.g. "
                "from_vals on (nblock, rec) values, then resample)"
            )
            raise ValueError(msg)
        axis = int(axis) % nb
        nblock = self.wsum.shape[axis]
        indices, freq = _normalize_sampler(sampler, nblock, rng=rng)
        freq = jnp.asarray(freq, dtype=self.wsum.dtype)
        bshape = [1] * nb
        bshape[axis] = nblock

        def _one(freq_r):
            return self._merge_along(self.wsum * freq_r.reshape(bshape), axis)

        # rep axis leads the batch axes (after the deriv axis on xalpha
        # x-arrays); moment axis stays leading on du/dxdu
        xa = self.xalpha
        xave, uave, du, dxdu, wsum = jax.vmap(
            _one, out_axes=(1 if xa else 0, 0, 1, 2 if xa else 1, 0)
        )(freq)
        meta = self.meta.resample(self, indices=indices, freq=freq, **kws)
        return replace(
            self, xave=xave, uave=uave, du=du, dxdu=dxdu, wsum=wsum, meta=meta
        )

    # -- streaming accumulation (beyond reference scope) ----------------------
    #
    # The reference reduces complete timeseries in one shot (cmomy
    # wrap_reduce_vals, data.py:485-534); a production serving loop instead
    # receives samples in chunks as a simulation runs.  ``zeros`` +
    # ``push_vals`` / ``merge`` turn the moment container itself into an
    # exact online accumulator: each chunk is reduced by the fused kernel,
    # then pooled with the running state by the same exact shifted-moment
    # merge used by ``reduce`` and the sharded reduction — no loss of
    # precision versus a one-shot reduce over the concatenated data, and no
    # need to retain samples.  All three are jit-compatible (the state is a
    # pytree; the default callback is static), so ``push_vals`` can be the
    # body of a ``lax.scan`` over pre-chunked sample arrays.

    @classmethod
    def zeros(
        cls,
        order: int,
        *,
        val_shape: tuple[int, ...] = (),
        batch_shape: tuple[int, ...] = (),
        deriv: int | None = None,
        dtype=jnp.float32,
        central: bool = True,
        x_is_u: bool = False,
        xalpha: bool = False,
        meta: DataCallbackABC | None = None,
    ):
        """Empty (zero-weight) accumulator state for streaming accumulation.

        ``batch_shape`` adds kept batch axes (e.g. a macrostate grid) that
        chunks pool into elementwise.  ``deriv`` (xalpha only, flat) is the
        size of the explicit-beta derivative axis (defaults to
        ``order + 1``).  Merging the empty state with any chunk returns
        that chunk's moments exactly (its weight is zero); calling
        ``derivs_args`` on a still-empty state is undefined (0/0).
        """
        val_shape = tuple(val_shape)
        batch_shape = tuple(batch_shape)
        if xalpha and batch_shape:
            msg = "zeros with both a deriv axis and batch axes is not supported"
            raise ValueError(msg)
        d = (int(deriv) if deriv is not None else order + 1,) if xalpha else ()
        # canonical du pad convention: val pads only, deriv axis broadcast
        pad = (1,) * len(val_shape)
        du = jnp.zeros((order + 1, *batch_shape, *pad), dtype).at[0].set(1.0)
        return cls(
            xave=jnp.zeros((*d, *batch_shape, *val_shape), dtype),
            uave=jnp.zeros(batch_shape, dtype),
            du=du,
            dxdu=jnp.zeros((order + 1, *d, *batch_shape, *val_shape), dtype),
            wsum=jnp.zeros(batch_shape, dtype),
            meta=meta if meta is not None else DataCallback(),
            order=int(order),
            central=bool(central),
            x_is_u=bool(x_is_u),
            xalpha=bool(xalpha),
            val_ndim=len(val_shape),
        )

    def merge(self, *others: "DataCentralMoments"):
        """Exactly pool this moment state with ``others`` (weighted by each
        state's ``wsum``), as if all underlying samples had been reduced in
        one shot.  Batch axes (e.g. a macrostate grid) are kept and pooled
        elementwise; ``xalpha`` is supported for flat states (the deriv
        axis precedes batch axes in the xalpha layout, so the two cannot
        be stacked together).
        """
        states = (self, *others)
        for o in others:
            same = (
                o.order == self.order
                and o.central == self.central
                and o.x_is_u == self.x_is_u
                and o.xalpha == self.xalpha
                and o.val_ndim == self.val_ndim
                and o.wsum.shape == self.wsum.shape
            )
            if not same:
                msg = (
                    "merge requires identical order/central/x_is_u/xalpha/"
                    "val_ndim and batch shape"
                )
                raise ValueError(msg)
        if self.xalpha and self.wsum.ndim != 0:
            msg = "merge with both a deriv axis and batch axes is not supported"
            raise ValueError(msg)
        # stack with the batch axis where merge_central_comoments expects it
        # (axis 0 of the means/weights, axis 1 of the moment arrays); for
        # xalpha the deriv axis stays behind the new batch axis, which the
        # merge treats as an ordinary broadcast (val-like) axis.  du pad
        # conventions differ across constructors (from_vals pads val axes
        # only; from_ave_central pads through the deriv axis) — normalize
        # to the full dxdu rank before stacking.
        xave, uave, du, dxdu, wsum = merge_central_comoments(
            jnp.stack([s.xave for s in states], axis=0),
            jnp.stack([s.uave for s in states], axis=0),
            jnp.stack(
                [_pad_val(s.du, s.dxdu.ndim - s.du.ndim) for s in states],
                axis=1,
            ),
            jnp.stack([s.dxdu for s in states], axis=1),
            jnp.stack([s.wsum for s in states], axis=0),
            axis=0,
        )
        # all du pad axes are singletons — emit the from_vals convention
        # ((order+1, *batch) + val pads, deriv axis broadcast) regardless
        # of input ranks
        du = du.reshape(
            (self.order + 1, *uave.shape) + (1,) * self.val_ndim
        )
        return replace(
            self, xave=xave, uave=uave, du=du, dxdu=dxdu, wsum=wsum,
            meta=self.meta.reduce(self),
        )

    def push_vals(self, xv, uv, *, weight=None):
        """Streaming update: reduce one chunk of samples (fused kernel on
        TPU) and exactly merge it into this state.  Returns the new state;
        usable as a ``lax.scan`` body over pre-chunked arrays.
        """
        chunk = type(self).from_vals(
            None if self.x_is_u else xv,
            uv,
            self.order,
            weight=weight,
            central=self.central,
            xalpha=self.xalpha,
            x_is_u=self.x_is_u,
            meta=self.meta,
        )
        return self.merge(chunk)

    def save(self, path) -> None:
        """Checkpoint the moment state to one ``.npz`` file — the restart
        seam for streaming ingestion (a crashed/preempted producer resumes
        from the last checkpoint and replays only the chunks after it;
        the GPR stack persists its parameters the same way,
        ``HeteroscedasticGPR.save_params``, and the reference persists
        active-learning state in ``active_history.npz``).

        Arrays are stored at their own dtype when numpy can serialize it
        (f32/f64); a bfloat16 accumulator is stored as f32 (exact — f32
        is a superset) and restored to bfloat16.  The ``meta`` callback is
        NOT serialized: pass the (stateless) callback back to :meth:`load`.
        """
        import json as _json

        import numpy as _np

        arrays = {}
        dtypes = {}
        for k in ("xave", "uave", "du", "dxdu", "wsum"):
            a = getattr(self, k)
            dtypes[k] = str(a.dtype)
            a = _np.asarray(
                a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a
            )
            arrays[k] = a
        header = {
            "order": self.order,
            "central": self.central,
            "x_is_u": self.x_is_u,
            "xalpha": self.xalpha,
            "val_ndim": self.val_ndim,
            "dtypes": dtypes,
        }
        # np.savez appends ".npz" to suffixless paths; normalize here so
        # save(p) / load(p) round-trip for ANY p (a bare path otherwise
        # written as p.npz would make load(p) fail — or silently read a
        # stale file at the bare path)
        path = str(path)
        if not path.endswith(".npz"):
            path += ".npz"
        _np.savez(path, _header=_json.dumps(header), **arrays)

    @classmethod
    def load(cls, path, *, meta: DataCallbackABC | None = None):
        """Restore a state checkpointed by :meth:`save`."""
        import json as _json
        import os as _os

        import numpy as _np

        # mirror save()'s suffix normalization (but keep an existing bare
        # path working if the file really is there)
        path = str(path)
        if not path.endswith(".npz") and not _os.path.exists(path):
            path += ".npz"
        with _np.load(path) as z:
            header = _json.loads(str(z["_header"]))
            fields = {
                k: jnp.asarray(z[k], dtype=header["dtypes"][k])
                for k in ("xave", "uave", "du", "dxdu", "wsum")
            }
        return cls(
            **fields,
            meta=meta if meta is not None else DataCallback(),
            order=int(header["order"]),
            central=bool(header["central"]),
            x_is_u=bool(header["x_is_u"]),
            xalpha=bool(header["xalpha"]),
            val_ndim=int(header["val_ndim"]),
        )


class DataCentralMomentsVals(DataValues):
    """Values-backed central-moment data (reference data.py:1643-1813).

    Same storage as :class:`DataValues` with ``central=True``; kept as a
    distinct name for API parity.  ``resample`` reduces via the freq-matmul
    kernel instead of materializing resampled values.
    """

    @classmethod
    def from_vals(cls, xv, uv, order, **kws):
        kws.setdefault("central", True)
        return super().from_vals(xv, uv, order, **kws)

    def resample(self, sampler, *, rng=None, **kws):
        if self.nbatch:
            return super().resample(sampler, rng=rng, **kws)
        indices, freq = _normalize_sampler(sampler, len(self), rng=rng)
        return DataCentralMoments.from_resample_vals(
            None if self.x_is_u else self.xv,
            self.uv,
            self.order,
            {"indices": indices, "freq": freq},
            weight=self.weight,
            central=self.central,
            x_is_u=self.x_is_u,
            xalpha=self.xalpha,
            meta=self.meta,
        )


def factory_data_values(
    uv,
    xv,
    order: int,
    *,
    central: bool = False,
    xalpha: bool = False,
    x_is_u: bool = False,
    weight=None,
    meta=None,
    **_kws,
):
    """Dispatch DataValues vs DataValuesCentral (reference data.py:659-730).

    Examples
    --------
    >>> import numpy as np
    >>> uv = np.array([1.0, 2.0, 3.0, 4.0])
    >>> xv = np.array([2.0, 4.0, 6.0, 8.0])
    >>> d = factory_data_values(uv=uv, xv=xv, order=2, central=True)
    >>> float(d.uave), float(d.xave)
    (2.5, 5.0)
    >>> [float(v) for v in d.du]  # du[0]=1, du[1]=0, du[2]=Var[u]
    [1.0, 0.0, 1.25]
    """
    cls = DataValuesCentral if central else DataValues
    return cls.from_vals(
        xv,
        uv,
        order,
        weight=weight,
        central=central,
        xalpha=xalpha,
        x_is_u=x_is_u,
        meta=meta,
    )


# ---------------------------------------------------------------------------
# reference base-class parity (virtual ABCs)
# ---------------------------------------------------------------------------
# The reference exposes an abstract hierarchy (AbstractData -> DataValuesBase
# / DataCentralMomentsBase, data.py:253-339, 828-1013); the collapsed
# two-class design here shares no implementation, so these are *virtual*
# bases: reference-style ``isinstance(data, AbstractData)`` checks keep
# working without entangling the concrete classes.

import abc as _abc


class AbstractData(_abc.ABC):
    """Virtual common base of every data class (reference data.py:253-339)."""


class DataValuesBase(_abc.ABC):
    """Virtual base of the value-backed classes (reference data.py:342-449)."""


class DataCentralMomentsBase(_abc.ABC):
    """Virtual base of the moment-backed classes (reference data.py:828-1013)."""


for _cls in (DataValues, DataCentralMoments):
    AbstractData.register(_cls)
DataValuesBase.register(DataValues)
for _cls in (DataCentralMoments, DataCentralMomentsVals):
    DataCentralMomentsBase.register(_cls)
del _cls

__all__ += ["AbstractData", "DataCentralMomentsBase", "DataValuesBase"]
