"""Pytree dataclass helpers.

The reference library (thermoextrap) builds its data/model objects on ``attrs``
+ ``xarray`` (see /root/reference/src/thermoextrap/core/_attrs_utils.py:85-200).
Here every container is a frozen dataclass registered as a JAX pytree so that
whole models can flow through ``jit`` / ``vmap`` / ``pjit`` unchanged: array
fields are pytree leaves, configuration fields are static (hashable) aux data.
"""

from __future__ import annotations

import dataclasses
import weakref
from typing import Any, TypeVar

import jax

T = TypeVar("T")

# class -> meta_fields it was registered with (subclass auto-registration
# means an explicitly re-decorated subclass would otherwise trip jax's
# duplicate-registration error; same split = idempotent, different = loud)
_REGISTERED: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def pytree_dataclass(cls: type[T] | None = None, *, meta_fields: tuple[str, ...] = ()):
    """Class decorator: frozen dataclass registered as a JAX pytree.

    Parameters
    ----------
    meta_fields :
        Names of fields treated as static auxiliary data (must be hashable).
        All other fields are pytree children (arrays / nested pytrees).

    Subclasses are registered automatically (jax pytree registration is
    keyed on the exact type, NOT inherited): an alias subclass such as
    ``DataValuesCentral(DataValues)`` must itself be registered or its
    instances silently flatten as one opaque leaf — breaking ``tree_map``,
    checkpointing, and any jit boundary they cross.  Inherited ``meta``
    split applies; fields a subclass adds default to data fields.
    """

    meta = tuple(meta_fields)

    def register(c: type) -> None:
        prior = _REGISTERED.get(c)
        if prior is not None:
            if prior != meta:
                msg = (
                    f"{c.__name__} was already auto-registered as a pytree "
                    f"with meta_fields={prior} (inherited); re-decorating a "
                    f"subclass with different meta_fields={meta} is not "
                    f"supported"
                )
                raise TypeError(msg)
            return
        fields = [f.name for f in dataclasses.fields(c)]
        data_fields = tuple(f for f in fields if f not in meta)
        jax.tree_util.register_dataclass(c, data_fields=data_fields, meta_fields=meta)
        _REGISTERED[c] = meta

    def wrap(c: type[T]) -> type[T]:
        # the subclass hook below may already have dataclass-processed c
        # (explicit re-decoration of a subclass); applying frozen dataclass
        # machinery twice is a TypeError
        if "__dataclass_fields__" not in c.__dict__:
            c = dataclasses.dataclass(frozen=True)(c)
        register(c)

        def __init_subclass__(sub, **kwargs):
            super(c, sub).__init_subclass__(**kwargs)
            dataclasses.dataclass(frozen=True)(sub)
            register(sub)

        c.__init_subclass__ = classmethod(__init_subclass__)
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
