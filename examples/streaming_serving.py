"""Streaming serving: accumulate sample chunks online, predict anytime.

A live simulation pushes chunks of (u, x) samples into a tiny moment-state
pytree as they are produced; each update runs the fused Pallas reduction
on the chunk and pools it into the state with the exact shifted-moment
merge — no samples are retained, and the running prediction is available
after every chunk at negligible cost.  The final state is numerically
identical to a one-shot reduction over everything seen (up to float
associativity); the reference has no streaming path (it reduces complete
timeseries, reference data.py:485-534).

Run: python examples/streaming_serving.py          (real TPU)
     python examples/streaming_serving.py --smoke  (CPU, small sizes)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from _smoke import setup as _smoke_setup

SMOKE = _smoke_setup()

import jax
import jax.numpy as jnp
import numpy as np

from thermoextrap_tpu import idealgas
from thermoextrap_tpu.pipeline import (
    make_extrap_pipeline,
    make_lnpi_pipeline,
    make_streaming_extrap_pipeline,
    make_streaming_lnpi_pipeline,
)


def main() -> None:
    beta0, order = 2.0, 4
    n_chunks = 8
    chunk = 2_000 if SMOKE else 1 << 22  # samples per chunk
    betas = jnp.asarray([1.6, 1.8, 2.0, 2.2, 2.4], jnp.float32)
    exact = np.array([idealgas.x_ave(float(b)) for b in betas])

    state, update, predict = make_streaming_extrap_pipeline(order, beta0)

    # "live" ingest: a new chunk arrives, the state absorbs it, and the
    # current prediction is ready immediately
    us, xs = [], []
    t_update = 0.0
    for i in range(n_chunks):
        x, u = idealgas.generate_data((chunk, 100), beta0, rng=i)
        u = jnp.asarray(u, jnp.float32)
        x = jnp.asarray(x, jnp.float32)
        us.append(u)
        xs.append(x)
        t0 = time.perf_counter()
        state = update(state, u, x)
        float(state.wsum)  # sync
        t_update += time.perf_counter() - t0
        if i in (0, n_chunks - 1):
            pred = np.asarray(predict(state, betas))
            print(
                f"after chunk {i + 1}/{n_chunks} "
                f"({int(np.asarray(state.wsum)):.2e} samples): "
                f"max |pred - analytic| = {np.max(np.abs(pred - exact)):.2e}"
            )

    n_total = n_chunks * chunk
    print(
        f"streamed {n_total:.2e} samples in {n_chunks} chunks; "
        f"mean update cost {t_update / n_chunks * 1e3:.1f} ms/chunk "
        f"(first includes compile)"
    )

    # the streamed state is exactly the one-shot answer over everything
    run = make_extrap_pipeline(order, beta0)
    want = np.asarray(run(jnp.concatenate(us), jnp.concatenate(xs), betas))
    got = np.asarray(predict(state, betas))
    err = np.max(np.abs(want - got) / np.abs(want))
    print(f"streamed vs one-shot relative error: {err:.2e}")
    assert err < 1e-4  # f32 path: pure summation-order roundoff

    # prediction accuracy vs the analytic ideal gas at beta0
    assert np.abs(got[2] - exact[2]) < 5e-3

    # ---- restartable ingest: checkpoint the accumulator to one npz file;
    # a preempted producer resumes from it and replays only later chunks
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        ckpt = Path(td) / "stream_ckpt.npz"
        state.save(ckpt)
        resumed = type(state).load(ckpt)
    np.testing.assert_array_equal(
        np.asarray(predict(resumed, betas)), got
    )
    print("checkpoint/restore round-trip: exact")

    # ---- async checkpointing while ingest continues: the orbax adapter
    # snapshots the state and serializes on a worker; for mesh-sharded
    # states every leaf is written from the devices that own it
    from thermoextrap_tpu.utils import checkpoint as ck

    with tempfile.TemporaryDirectory() as td, ck.AsyncPytreeSaver() as saver:
        saver.save(Path(td) / "async_ckpt", state)
        # ... producer keeps folding chunks here while the write runs ...
        saver.wait()
        restored = ck.restore_pytree(Path(td) / "async_ckpt", state)
    np.testing.assert_array_equal(
        np.asarray(predict(restored, betas)), got
    )
    print("async orbax checkpoint round-trip: exact")

    # ---- streaming a macrostate grid (lnPi): each chunk carries the whole
    # grid's new energy samples; the state pools elementwise per macrostate
    n_grid, r_chunk = (12, 2_000) if SMOKE else (256, 1 << 18)
    order_g, beta0_g = 3, 1.4
    kg = jax.random.key(3)
    lnpi0 = jnp.linspace(0.0, 4.0, n_grid)
    mudotn = 0.5 * jnp.arange(n_grid, dtype=jnp.float32)

    g_state, g_update, g_predict = make_streaming_lnpi_pipeline(
        order_g, beta0_g, grid_shape=(n_grid,)
    )
    gs = []
    for i in range(4):
        kg, ki = jax.random.split(kg)
        blk = -10.0 + jnp.linspace(-1, 1, n_grid)[:, None] + jax.random.normal(
            ki, (n_grid, r_chunk), dtype=jnp.float32
        )
        gs.append(blk)
        g_state = g_update(g_state, blk)
    grid_pred = np.asarray(
        g_predict(g_state, lnpi0, mudotn, jnp.asarray([1.2, 1.4, 1.6]))
    )
    one_shot = np.asarray(
        make_lnpi_pipeline(order_g, beta0_g)(
            jnp.concatenate(gs, axis=-1), lnpi0, mudotn,
            jnp.asarray([1.2, 1.4, 1.6]),
        )
    )
    gerr = np.max(np.abs(grid_pred - one_shot))
    print(
        f"streamed lnPi grid ({n_grid} macrostates x 4 x {r_chunk:.0e} "
        f"samples): max |streamed - one-shot| = {gerr:.2e}"
    )
    assert gerr < 1e-3  # f32 associativity on lnPi magnitudes

    # ---- streaming uncertainty: nrep Poisson-bootstrap replicate
    # accumulators ride in the state (in-kernel PRNG frequencies on the
    # TPU — no (nrep, chunk) table ever exists); predict returns
    # (pred, std) at any point in the stream
    c_state, c_update, c_predict = make_streaming_extrap_pipeline(
        order, beta0, nrep=64, seed=17
    )
    for i in range(n_chunks):
        c_state = c_update(c_state, us[i], xs[i])
    c_pred, c_std = (np.asarray(a) for a in c_predict(c_state, betas))
    # CI sanity: the analytic answer sits within a few streamed sigmas
    z = np.abs(c_pred - exact) / c_std
    print(
        f"streamed bootstrap CI (nrep=64): std range "
        f"[{c_std.min():.2e}, {c_std.max():.2e}], max |z| = {z.max():.1f}"
    )
    np.testing.assert_allclose(c_pred, got, rtol=1e-6)  # mean leg untouched
    assert np.all(c_std > 0)

    # ---- file-fed ingest with the prefetching loader: trajectory chunks
    # are parsed (C++ loader) and staged on a worker thread while the
    # jitted update reduces the previous chunk
    import tempfile

    from thermoextrap_tpu import io_stream

    n_files, r_file = 4, (1_000 if SMOKE else 1 << 16)
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i in range(n_files):
            x, u = idealgas.generate_data((r_file, 100), beta0, rng=100 + i)
            p = Path(td) / f"traj_{i}.txt"
            np.savetxt(p, np.stack([np.asarray(u), np.asarray(x)], axis=1))
            paths.append(p)
        f_state, f_update, f_predict = make_streaming_extrap_pipeline(
            order, beta0
        )
        f_state = io_stream.ingest_stream(
            f_update,
            f_state,
            io_stream.read_table_chunks(paths, columns=(0, 1), depth=2),
        )
    f_pred = np.asarray(f_predict(f_state, betas))
    print(
        f"prefetched file ingest ({n_files} files x {r_file:.0e} rows): "
        f"max |pred - analytic| = {np.max(np.abs(f_pred - exact)):.2e}"
    )
    assert np.abs(f_pred[2] - exact[2]) < 5e-2

    # ---- bucketed serving: any request size served without recompiles
    from thermoextrap_tpu.pipeline import make_bucketed_extrap_runner

    serve = make_bucketed_extrap_runner(order, beta0, buckets=(1 << 11, 1 << 13))
    for r_req in (1_500, 1_800, 5_000):  # three sizes, two compiled programs
        x, u = idealgas.generate_data((r_req, 100), beta0, rng=r_req)
        pred = np.asarray(
            serve(np.asarray(u, np.float32), np.asarray(x, np.float32)[:, None], betas)
        )
        assert np.isfinite(pred).all()
    print(f"bucketed serving: sizes (1500, 1800, 5000) -> buckets {serve.buckets}")

    # ---- AOT streaming bundle: update+predict+init-state in ONE file; the
    # serving process needs no package code (see docs/serving.md)
    import tempfile

    from thermoextrap_tpu import serving_export as se

    art = se.export_streaming_extrap_pipeline(order, beta0)
    with tempfile.TemporaryDirectory() as td:
        art.save(td + "/stream.thexport")
        art2 = se.load_exported(td + "/stream.thexport")
        st = art2.init_state()
        x, u = idealgas.generate_data((4_000, 100), beta0, rng=9)
        u = np.asarray(u, np.float32)
        x = np.asarray(x, np.float32)
        st = art2.update(st, u[:2_500], x[:2_500])
        st = art2.update(st, u[2_500:], x[2_500:])  # different chunk length
        b_pred = np.asarray(art2.predict(st, betas))
    print(
        "AOT streaming bundle (2 ragged chunks): "
        f"max |pred - analytic| = {np.max(np.abs(b_pred - exact)):.2e}"
    )
    assert np.abs(b_pred[2] - exact[2]) < 5e-2


if __name__ == "__main__":
    main()
