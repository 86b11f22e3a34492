"""Utility helpers: pytree dataclasses and the RNG seam."""

from .random import validate_rng
from .trees import asdict, pytree_dataclass, replace

__all__ = ["asdict", "pytree_dataclass", "replace", "validate_rng"]
