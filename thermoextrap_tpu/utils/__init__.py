"""Utility helpers: pytree dataclasses, the RNG seam, compile cache,
orbax checkpointing (``utils.checkpoint`` — imported on demand, orbax is
heavy), K-chain timing (``utils.timing``)."""

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
