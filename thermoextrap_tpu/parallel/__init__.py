"""Multi-device sharding: mesh helpers and sharded moment reduction."""

from .sharded import (
    make_mesh,
    reduce_central_comoments_sharded,
    reduce_central_umoments_batched_sharded,
    resample_central_comoments_sharded,
    resample_central_umoments_batched_sharded,
    shard_rec,
)

__all__ = [
    "make_mesh",
    "reduce_central_comoments_sharded",
    "reduce_central_umoments_batched_sharded",
    "resample_central_comoments_sharded",
    "resample_central_umoments_batched_sharded",
    "shard_rec",
]
