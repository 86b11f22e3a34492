"""Pytree dataclass helpers.

The reference library (thermoextrap) builds its data/model objects on ``attrs``
+ ``xarray`` (see /root/reference/src/thermoextrap/core/_attrs_utils.py:85-200).
Here every container is a frozen dataclass registered as a JAX pytree so that
whole models can flow through ``jit`` / ``vmap`` / ``pjit`` unchanged: array
fields are pytree leaves, configuration fields are static (hashable) aux data.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

T = TypeVar("T")


def pytree_dataclass(cls: type[T] | None = None, *, meta_fields: tuple[str, ...] = ()):
    """Class decorator: frozen dataclass registered as a JAX pytree.

    Parameters
    ----------
    meta_fields :
        Names of fields treated as static auxiliary data (must be hashable).
        All other fields are pytree children (arrays / nested pytrees).
    """

    def wrap(c: type[T]) -> type[T]:
        c = dataclasses.dataclass(frozen=True)(c)
        fields = [f.name for f in dataclasses.fields(c)]
        data_fields = tuple(f for f in fields if f not in meta_fields)
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(meta_fields)
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def replace(obj: T, **changes: Any) -> T:
    """``dataclasses.replace`` for pytree dataclasses (mirrors attrs ``new_like``)."""
    return dataclasses.replace(obj, **changes)


def asdict(obj: Any) -> dict[str, Any]:
    """Shallow dict of dataclass fields (mirrors reference ``MyAttrsMixin.asdict``)."""
    return {f.name: getattr(obj, f.name) for f in dataclasses.fields(obj)}
