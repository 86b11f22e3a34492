"""Pytree dataclass registration (utils/trees.py), incl. subclass inheritance.

jax registers pytree flatteners per exact type; a subclass of a registered
dataclass is NOT automatically a pytree.  ``pytree_dataclass`` installs an
``__init_subclass__`` hook so alias subclasses (``DataValuesCentral``,
``DataCentralMomentsVals``) register themselves — otherwise they flatten as
one opaque leaf and break tree_map / checkpointing / jit boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thermoextrap_tpu import factory_data_values
from thermoextrap_tpu.data import DataCentralMomentsVals, DataValues, DataValuesCentral
from thermoextrap_tpu.utils.trees import pytree_dataclass, replace


def _leaves(x):
    return jax.tree_util.tree_leaves(x)


def test_alias_subclasses_flatten_like_base(rng_np):
    uv = rng_np.normal(3.0, 1.0, 50)
    xv = rng_np.normal(1.0, 0.5, (50, 2))
    base = DataValues.from_vals(xv, uv, 2)
    for cls in (DataValuesCentral, DataCentralMomentsVals):
        d = cls.from_vals(xv, uv, 2)
        assert len(_leaves(d)) == len(_leaves(base)) >= 2
        leaves, treedef = jax.tree_util.tree_flatten(d)
        back = jax.tree_util.tree_unflatten(treedef, leaves)
        assert type(back) is cls
        np.testing.assert_array_equal(np.asarray(back.uv), uv)


def test_factory_central_result_is_pytree(rng_np):
    d = factory_data_values(
        uv=rng_np.normal(3.0, 1.0, 40),
        xv=rng_np.normal(1.0, 0.5, (40, 1)),
        order=2,
        central=True,
    )
    # crosses a jit boundary as a pytree argument, not an opaque leaf
    f = jax.jit(lambda data: jnp.sum(data.uv))
    np.testing.assert_allclose(float(f(d)), float(np.sum(np.asarray(d.uv))))


def test_subclass_hook_registers_new_fields_as_data():
    @pytree_dataclass(meta_fields=("tag",))
    class Base:
        a: jax.Array
        tag: str

    class Child(Base):
        b: jax.Array

    c = Child(a=jnp.ones(3), tag="t", b=jnp.zeros(2))
    leaves = _leaves(c)
    assert len(leaves) == 2  # a and b are data; tag is static
    doubled = jax.tree_util.tree_map(lambda x: 2 * x, c)
    assert type(doubled) is Child and doubled.tag == "t"
    np.testing.assert_array_equal(np.asarray(doubled.b), np.zeros(2))

    # replace() works through the inherited dataclass machinery
    r = replace(c, tag="u")
    assert r.tag == "u" and type(r) is Child

    # frozen-ness is inherited by the auto-registered subclass
    import dataclasses

    with pytest.raises(dataclasses.FrozenInstanceError):
        c.a = jnp.zeros(3)


def test_redecorated_subclass_same_meta_is_idempotent():
    @pytree_dataclass(meta_fields=("tag",))
    class Base2:
        a: jax.Array
        tag: str

    @pytree_dataclass(meta_fields=("tag",))
    class Child2(Base2):
        pass

    c = Child2(a=jnp.ones(2), tag="t")
    assert len(_leaves(c)) == 1

    with pytest.raises(TypeError, match="meta_fields"):

        @pytree_dataclass(meta_fields=())
        class Child3(Base2):
            pass
