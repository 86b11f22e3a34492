r"""Inverse-temperature expansion of the macrostate distribution lnΠ.

TPU-native rebuild of /root/reference/src/thermoextrap/lnpi.py.  For the
grand-canonical macrostate distribution :math:`\ln\Pi(N)` measured by
transition-matrix MC,

.. math:: \frac{d \ln\Pi}{d\beta} = \mu\!\cdot\!N - \langle u\rangle_N

(GC-average terms independent of N are dropped, reference lnpi.py:42-74), so
order-:math:`m` derivatives of lnΠ are order-:math:`m-1` derivatives of
:math:`\langle u\rangle` — the engine integrates the ``u_ave`` series once
(:func:`thermoextrap_tpu.models.derivatives.lnpi_coefs`).

Data convention: the macrostate grid (``dims_n``) lives in the *batch* axes
of the data object (``uv``: ``(*n_grid, rec)`` with ``x_is_u=True``), so a
single reduction produces energy moments for every macrostate at once.
"""

from __future__ import annotations

import jax.numpy as jnp

from .models.derivatives import (
    Derivatives,
    central_u_ave_coefs,
    lnpi_coefs,
    raw_u_ave_coefs,
)
from .models.extrap import ExtrapModel
from .utils.trees import pytree_dataclass

__all__ = ["factory_derivatives", "factory_extrapmodel_lnPi", "lnPiDataCallback"]


def _lnpi_coefs_fn(central: bool):
    def coefs_fn(args, order):
        *uargs, lnpi0, mudotn = args
        if order == 0:
            return lnpi_coefs(
                jnp.zeros((1,) + jnp.shape(jnp.asarray(lnpi0))), lnpi0, mudotn, order
            )
        if central:
            u_c = central_u_ave_coefs(*uargs, order - 1)
        else:
            u_c = raw_u_ave_coefs(*uargs, order - 1)
        return lnpi_coefs(u_c, lnpi0, mudotn, order)

    return coefs_fn


def factory_derivatives(
    name: str = "lnPi",
    *,
    central: bool = False,
    post_func=None,
    **kws,
) -> Derivatives:
    """Derivatives of lnΠ (reference lnpi.py:119-170); other names delegate
    to the β factory."""
    if name == "lnPi":
        return Derivatives(
            coefs_fn=_lnpi_coefs_fn(bool(central)),
            name="lnPi",
            post_func=post_func,
        )
    from . import beta as beta_xpan

    return beta_xpan.factory_derivatives(name=name, central=central, post_func=post_func, **kws)


@pytree_dataclass(meta_fields=("allow_resample",))
class lnPiDataCallback:  # noqa: N801 - reference name
    """Metadata callback carrying ``(lnPi0, mudotN)``
    (reference lnpi.py:180-289).

    ``lnPi0``: reference macrostate distribution over the N grid;
    ``mudotN``: :math:`\\mu \\cdot N` per macrostate (precomputed dot over
    the component axis, reference lnpi.py:253-256).
    """

    lnPi0: jnp.ndarray
    mudotN: jnp.ndarray
    allow_resample: bool = False

    @classmethod
    def from_mu(cls, lnPi0, mu, ncoords, *, comp_axis: int = 0, allow_resample=False):
        """Build from chemical potential(s) and particle-number coordinates.

        ``ncoords``: ``(ncomp, *n_grid)``; ``mu``: ``(ncomp,)``.
        """
        lnPi0 = jnp.asarray(lnPi0)
        mu = jnp.atleast_1d(jnp.asarray(mu))
        ncoords = jnp.asarray(ncoords)
        mudotn = jnp.tensordot(mu, ncoords, axes=([0], [comp_axis]))
        return cls(lnPi0=lnPi0, mudotN=mudotn, allow_resample=bool(allow_resample))

    def check(self, data) -> None:
        pass

    def reduce(self, data, **kws):
        return self

    def resample(self, data, **kws):
        if not self.allow_resample:
            msg = (
                "Set allow_resample=True to resample lnPi0 (ad-hoc; the "
                "reference recommends resampling collection matrices instead)"
            )
            raise ValueError(msg)
        return self

    def derivs_args(self, data, derivs_args):
        return (*tuple(derivs_args), self.lnPi0, self.mudotN)


def factory_extrapmodel_lnPi(  # noqa: N802 - reference name
    beta: float,
    data,
    *,
    central: bool | None = None,
    order: int | None = None,
    alpha_name: str = "beta",
    derivatives: Derivatives | None = None,
    post_func=None,
) -> ExtrapModel:
    """ExtrapModel for lnΠ β expansion (reference lnpi.py:372-438).

    ``order`` defaults to ``data.order + 1`` since lnΠ' = μN − <u> uses one
    fewer moment order than a direct observable.
    """
    if central is None:
        central = data.central
    if order is None:
        order = data.order + 1

    if central != data.central:
        msg = f"{central=} != {data.central=}"
        raise ValueError(msg)
    if order > data.order + 1:
        msg = f"{order=} must be <= data.order + 1 = {data.order + 1}"
        raise ValueError(msg)
    if not data.x_is_u:
        msg = "lnPi extrapolation requires x_is_u data"
        raise ValueError(msg)

    if derivatives is None:
        derivatives = factory_derivatives(
            name="lnPi", central=central, post_func=post_func
        )
    return ExtrapModel(
        alpha0=beta,
        data=data,
        derivatives=derivatives,
        order=order,
        minus_log=False,
        alpha_name=alpha_name,
    )
