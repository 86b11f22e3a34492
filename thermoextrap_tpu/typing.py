"""Shared type aliases (reference core/typing.py role)."""

from __future__ import annotations

from typing import Any, Callable, Mapping, Sequence, Union

import jax
import numpy as np

ArrayLike = Union[jax.Array, np.ndarray, Sequence[float], float]
"""Anything convertible to a jax array."""

Sampler = Union[Mapping[str, Any], np.ndarray, jax.Array]
"""Bootstrap sampler spec: ``{"nrep": R}``, ``{"indices": ...}``,
``{"freq": ...}``, or a bare (nrep, nsamp) index array."""

CoefsFn = Callable[[tuple, int], jax.Array]
"""Derivative-engine coefficient function: ``(derivs_args, order) -> (order+1, ...)``."""

__all__ = ["ArrayLike", "CoefsFn", "Sampler"]
