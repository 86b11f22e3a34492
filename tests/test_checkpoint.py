"""Orbax checkpoint adapter (utils/checkpoint.py) round-trip gates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thermoextrap_tpu import pipeline
from thermoextrap_tpu.data import DataCentralMoments
from thermoextrap_tpu.utils import checkpoint as ck

pytest.importorskip("orbax.checkpoint")


def test_moment_state_roundtrip(tmp_path, rng_np):
    uv = rng_np.normal(3.0, 1.0, 500)
    xv = rng_np.normal(1.0, 0.5, (500, 2))
    state = DataCentralMoments.from_vals(xv, uv, 4)
    ck.save_pytree(tmp_path / "state", state)
    out = ck.restore_pytree(
        tmp_path / "state", DataCentralMoments.zeros(4, val_shape=(2,), dtype=uv.dtype)
    )
    # static metadata reconstructed from the template, leaves from disk
    assert out.order == state.order and out.central == state.central
    for k in ("xave", "uave", "du", "dxdu", "wsum"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out, k)), np.asarray(getattr(state, k))
        )


def test_streaming_resume_matches_uninterrupted(tmp_path, rng_np):
    # checkpoint mid-stream, restore, replay the remaining chunks: the
    # final prediction must equal the uninterrupted fold
    uv = rng_np.normal(3.0, 1.0, 600)
    xv = rng_np.normal(1.0, 0.5, 600)
    state0, update, predict = pipeline.make_streaming_extrap_pipeline(
        3, 1.0, dtype=np.float64
    )
    chunks = [(uv[i * 200 : (i + 1) * 200], xv[i * 200 : (i + 1) * 200]) for i in range(3)]

    full = state0
    for c in chunks:
        full = update(full, *c)

    half = update(state0, *chunks[0])
    ck.save_pytree(tmp_path / "mid", half)
    resumed = ck.restore_pytree(tmp_path / "mid", state0)
    for c in chunks[1:]:
        resumed = update(resumed, *c)

    betas = np.array([0.8, 1.2])
    np.testing.assert_allclose(
        np.asarray(predict(resumed, betas)),
        np.asarray(predict(full, betas)),
        rtol=1e-13,
    )


def test_sharded_roundtrip_preserves_sharding(tmp_path):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) >= 8
    mesh = Mesh(np.array(devs[:8]), ("rec",))
    sh = NamedSharding(mesh, P("rec"))
    a = jax.device_put(jnp.arange(64.0), sh)
    ck.save_pytree(tmp_path / "sharded", {"a": a})
    like = {"a": jax.ShapeDtypeStruct((64,), a.dtype, sharding=sh)}
    out = ck.restore_pytree(tmp_path / "sharded", like)
    assert out["a"].sharding == sh
    np.testing.assert_array_equal(np.asarray(out["a"]), np.arange(64.0))


def test_async_saver_serializes_and_waits(tmp_path, rng_np):
    uv = rng_np.normal(3.0, 1.0, 300)
    xv = rng_np.normal(1.0, 0.5, 300)
    state = DataCentralMoments.from_vals(xv[:, None], uv, 3)
    with ck.AsyncPytreeSaver() as saver:
        saver.save(tmp_path / "s1", state)
        saver.save(tmp_path / "s2", state)  # queued behind s1
        saver.wait()
        like = DataCentralMoments.zeros(3, val_shape=(1,), dtype=uv.dtype)
        for p in ("s1", "s2"):
            out = ck.restore_pytree(tmp_path / p, like)
            np.testing.assert_array_equal(
                np.asarray(out.dxdu), np.asarray(state.dxdu)
            )
