"""Utility helpers: pytree dataclasses, the RNG seam, compile cache."""

from .compile_cache import enable_compilation_cache
from .random import validate_rng
from .trees import asdict, pytree_dataclass, replace

__all__ = [
    "asdict",
    "enable_compilation_cache",
    "pytree_dataclass",
    "replace",
    "validate_rng",
]
