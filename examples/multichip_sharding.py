"""Sharded moment reduction + bootstrap over a device mesh.

Demonstrates the multi-chip path: the sample axis (rec) is sharded over the
mesh for the reduction, and a 2D (rep, rec) mesh shards the bootstrap
frequency matmul.  Runs on any device count (set
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu to try
8 virtual devices on CPU).

Run: python examples/multichip_sharding.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _smoke import setup as _smoke_setup

SMOKE = _smoke_setup(n_devices=8)  # smoke: 8 virtual CPU devices

import jax
import jax.numpy as jnp

from thermoextrap_tpu.ops.resample import freq_from_indices, random_indices
from thermoextrap_tpu.parallel import (
    make_mesh,
    reduce_central_comoments_sharded,
    resample_central_comoments_sharded,
    shard_rec,
)


def main() -> None:
    n_dev = len(jax.devices())
    print(f"devices: {jax.devices()}")

    order, r, v, nrep = 6, (1 << 12 if SMOKE else 1 << 16), 2, 32
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    uv = 5.0 + jax.random.normal(k1, (r,))
    xv = 2.0 + 0.5 * jax.random.normal(k2, (r, v))

    mesh = make_mesh(n_dev, axis_names=("rec",))
    out = reduce_central_comoments_sharded(
        shard_rec(uv, mesh), shard_rec(xv, mesh), order, mesh
    )
    print("sharded reduce du[2:4]:", out[2][2:4])

    if n_dev >= 2:
        mesh2 = make_mesh(n_dev, axis_names=("rep", "rec"))
        freq = freq_from_indices(random_indices(k3, nrep, r), r)
        xave, _u, du, _dx = resample_central_comoments_sharded(
            uv, xv, freq, order, mesh2
        )
        print("bootstrap du[2] mean over reps:", jnp.mean(du[2]))
        print("bootstrap xave std over reps:", jnp.std(xave, axis=0))

        # lnPi-style macrostate grid: batched u-moment reduce + shared-freq
        # grid bootstrap, both sharded on the sample axis
        from jax.sharding import NamedSharding, PartitionSpec as P

        from thermoextrap_tpu.parallel import (
            reduce_central_umoments_batched_sharded,
            resample_central_umoments_batched_sharded,
        )

        n_grid = 6
        uvg = jnp.linspace(-1, 1, n_grid)[:, None] + jax.random.normal(
            k3, (n_grid, r)
        )
        uvg = jax.device_put(uvg, NamedSharding(mesh2, P(None, "rec")))
        uave_g, du_g = reduce_central_umoments_batched_sharded(
            uvg, order, mesh2
        )
        bu_g, _bdu_g = resample_central_umoments_batched_sharded(
            uvg, freq, order, mesh2
        )
        print("grid reduce uave:", uave_g[:3])
        print("grid bootstrap SEM:", jnp.std(bu_g, axis=0)[:3])


if __name__ == "__main__":
    main()
