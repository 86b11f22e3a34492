"""Random-number seam (mirrors /root/reference/src/thermoextrap/random.py:1-16).

The reference delegates to ``cmomy.random.default_rng``; here the single RNG
seam is a ``jax.random`` key.  All stochastic entry points in this package
(bootstrap samplers, ideal-gas data generation) accept either a
``jax.random.PRNGKey`` / new-style ``jax.random.key`` or an integer seed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_DEFAULT_SEED = 0


def validate_rng(rng=None) -> jax.Array:
    """Return a jax PRNG key from a key, an int seed, or None (fixed default)."""
    if rng is None:
        return jax.random.key(_DEFAULT_SEED)
    if isinstance(rng, (int, np.integer)) and not isinstance(rng, (bool, np.bool_)):
        # numpy integer seeds (e.g. rng.integers(...)) are accepted like the
        # reference's cmomy.random.validate_rng seed handling
        return jax.random.key(int(rng))
    if isinstance(rng, jax.Array) and jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        return rng
    if isinstance(rng, jax.Array) and rng.dtype == jnp.uint32:
        # legacy raw PRNGKey array
        return jax.random.wrap_key_data(rng)
    msg = f"cannot interpret {rng!r} as a jax PRNG key"
    raise TypeError(msg)


def split(rng, num: int = 2):
    return jax.random.split(validate_rng(rng), num)
