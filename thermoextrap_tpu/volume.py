r"""Volume extrapolation (first order).

TPU-native rebuild of /root/reference/src/thermoextrap/volume.py.  ``W``
(stored in the data's ``uv`` slot) is the *temperature-scaled virial*
:math:`\beta \mathcal{W}`; only first-order volume derivatives are defined
(higher orders would need force derivatives — reference volume.py:46-53):

.. math::

    \frac{d\langle x\rangle}{dV}
      = \frac{-\langle x\rangle\langle W\rangle + \langle x W\rangle
              + \langle \textstyle\sum_i \partial x/\partial q_i\, q_i\rangle}
             {V\, d}
"""

from __future__ import annotations

import jax.numpy as jnp

from .data import DataCallbackABC, DataValues
from .models.derivatives import Derivatives
from .models.extrap import ExtrapModel
from .ops.resample import resample_values
from .utils.trees import pytree_dataclass, replace

__all__ = ["VolumeDataCallback", "VolumeDerivFuncs", "factory_derivatives", "factory_extrapmodel"]


class VolumeDerivFuncs:
    """Indexable derivative functions (reference volume.py:39-80)."""

    def __getitem__(self, order: int):
        if order > 1:
            msg = (
                f"Volume derivatives cannot go past 1st order (received {order}); "
                "would need derivatives of forces"
            )
            raise ValueError(msg)
        return self.create_deriv_func(order)

    @staticmethod
    def create_deriv_func(order: int):
        def func(w, xw, dxdq, volume, ndim=1):
            # w = beta * virial moments; xw = <x W^n> raw comoments
            if order == 0:
                return xw[0]
            return (-xw[0] * w[1] + xw[1] + dxdq) / (volume * ndim)

        return func


def factory_derivatives() -> Derivatives:
    """Derivatives object for volume expansion (reference volume.py:83-87)."""
    return Derivatives.from_funcs(VolumeDerivFuncs(), name="volume")


@pytree_dataclass(meta_fields=("ndim",))
class VolumeDataCallback(DataCallbackABC):
    """Carries ``(volume, dxdqv, ndim)`` metadata and appends
    ``(dxdq_mean, volume, ndim)`` to ``derivs_args``
    (reference volume.py:90-134)."""

    volume: jnp.ndarray
    dxdqv: jnp.ndarray  # (rec, *val) samples of sum_i dx/dq_i q_i
    ndim: int

    def check(self, data) -> None:
        pass

    def dxdq(self, nbatch: int = 0, weight=None):
        if weight is None:
            return self.dxdqv.mean(axis=nbatch)
        # weighted data must weight EVERY stream consistently (the serving
        # pipeline packs dxdqv into the same weighted reduction as x)
        w = jnp.asarray(weight)
        w = w.reshape(w.shape + (1,) * (self.dxdqv.ndim - w.ndim))
        return (w * self.dxdqv).sum(axis=nbatch) / w.sum()

    def resample(self, data, *, indices=None, freq=None, **kws):
        if indices is None:
            msg = "volume callback resampling requires index-style sampler"
            raise NotImplementedError(msg)
        return replace(self, dxdqv=resample_values(self.dxdqv, indices, rec_axis=0))

    def derivs_args(self, data, derivs_args):
        return (
            *tuple(derivs_args),
            self.dxdq(
                nbatch=data.nbatch if hasattr(data, "nbatch") else 0,
                weight=getattr(data, "weight", None),
            ),
            self.volume,
            self.ndim,
        )


def factory_extrapmodel(
    volume: float,
    uv,
    xv,
    dxdqv,
    *,
    ndim: int = 3,
    order: int = 1,
    alpha_name: str = "volume",
    **kws,
) -> ExtrapModel:
    """ExtrapModel for volume expansion (reference volume.py:137-209).

    ``uv`` must be the temperature-scaled virial ``beta * virial``; ``dxdqv``
    holds samples of ``sum_i dx/dq_i q_i``.
    """
    if order != 1:
        msg = "only order=1 is supported"
        raise ValueError(msg)

    meta = VolumeDataCallback(
        volume=jnp.asarray(float(volume)), dxdqv=jnp.asarray(dxdqv), ndim=int(ndim)
    )
    data = DataValues.from_vals(
        xv, uv, order=order, central=False, meta=meta, **kws
    )
    return ExtrapModel(
        alpha0=volume,
        data=data,
        derivatives=factory_derivatives(),
        order=order,
        minus_log=False,
        alpha_name=alpha_name,
    )
