"""Random number seam (reference /root/reference/src/thermoextrap/random.py:1-16).

The single RNG entry point for the package: :func:`validate_rng` converts
``None`` / int seeds / jax keys into a ``jax.random`` key.  All stochastic
APIs (bootstrap samplers, ideal-gas generators, update policies) route
through this.
"""

from .utils.random import split, validate_rng

__all__ = ["split", "validate_rng"]
