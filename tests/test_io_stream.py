"""Prefetching ingest runtime (io_stream) correctness gates."""

import threading
import time

import numpy as np
import pytest

from thermoextrap_tpu import io_stream, pipeline


def test_order_and_values_preserved():
    out = list(io_stream.prefetch_chunks(range(20), load=lambda i: i * i, depth=3))
    assert out == [i * i for i in range(20)]


def test_identity_load():
    assert list(io_stream.prefetch_chunks(["a", "b"], depth=1)) == ["a", "b"]


def test_exception_propagates_at_consumption():
    def load(i):
        if i == 3:
            msg = "boom"
            raise RuntimeError(msg)
        return i

    it = io_stream.prefetch_chunks(range(10), load=load, depth=2)
    got = []
    with pytest.raises(RuntimeError, match="boom"):
        for v in it:
            got.append(v)
    assert got == [0, 1, 2]


def test_depth_bounds_prefetch():
    loaded = []
    release = threading.Event()

    def load(i):
        loaded.append(i)
        return i

    it = io_stream.prefetch_chunks(range(100), load=load, depth=2)
    first = next(it)
    assert first == 0
    # give the worker time to run ahead as far as the queue allows
    deadline = time.monotonic() + 2.0
    while len(loaded) < 3 and time.monotonic() < deadline:
        time.sleep(0.01)
    time.sleep(0.1)
    # one consumed + at most depth queued + one in flight
    assert len(loaded) <= 4
    it.close()
    release.set()


def test_abandoned_iterator_stops_worker():
    loaded = []

    it = io_stream.prefetch_chunks(range(10_000), load=lambda i: loaded.append(i) or i, depth=1)
    next(it)
    it.close()
    n_after_close = len(loaded)
    time.sleep(0.3)
    # worker must stop promptly: no unbounded progress after close
    assert len(loaded) <= n_after_close + 2


def test_depth_validation():
    with pytest.raises(ValueError, match="depth"):
        list(io_stream.prefetch_chunks([1], depth=0))


def test_read_table_chunks_roundtrip(tmp_path, rng_np):
    arrays = [rng_np.normal(size=(50, 2)) for _ in range(4)]
    paths = []
    for i, a in enumerate(arrays):
        p = tmp_path / f"chunk{i}.txt"
        np.savetxt(p, a)
        paths.append(p)
    got = list(io_stream.read_table_chunks(paths, depth=2))
    for g, e in zip(got, arrays):
        np.testing.assert_allclose(g, e, rtol=1e-10)


def test_ingest_stream_matches_one_shot(tmp_path, rng_np):
    # file-chunked prefetched ingest == one-shot pipeline on the full series
    uv_full = rng_np.normal(3.0, 1.0, 4000)
    xv_full = rng_np.normal(1.0, 0.5, 4000)
    paths = []
    for i in range(4):
        p = tmp_path / f"traj{i}.txt"
        np.savetxt(p, np.stack([uv_full[i * 1000 : (i + 1) * 1000],
                                xv_full[i * 1000 : (i + 1) * 1000]], axis=1))
        paths.append(p)

    state0, update, predict = pipeline.make_streaming_extrap_pipeline(
        3, 1.0, dtype=np.float64
    )
    state = io_stream.ingest_stream(
        update,
        state0,
        paths,
        load=lambda p: (lambda t: (t[:, 0], t[:, 1]))(np.loadtxt(p)),
    )
    betas = np.array([0.8, 1.0, 1.2])
    got = np.asarray(predict(state, betas))

    run = pipeline.make_extrap_pipeline(3, 1.0)
    want = np.asarray(run(uv_full, xv_full[:, None], betas))[:, 0]
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_read_table_chunks_columns_splat(tmp_path, rng_np):
    uv = rng_np.normal(size=300)
    xv = rng_np.normal(size=300)
    paths = []
    for i in range(3):
        p = tmp_path / f"t{i}.txt"
        np.savetxt(p, np.stack([uv[i * 100 : (i + 1) * 100], xv[i * 100 : (i + 1) * 100]], axis=1))
        paths.append(p)
    state0, update, predict = pipeline.make_streaming_extrap_pipeline(
        2, 1.0, dtype=np.float64
    )
    state = io_stream.ingest_stream(
        update, state0, io_stream.read_table_chunks(paths, columns=(0, 1))
    )
    run = pipeline.make_extrap_pipeline(2, 1.0)
    want = np.asarray(run(uv, xv[:, None], np.array([1.0])))[:, 0]
    got = np.asarray(predict(state, np.array([1.0])))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_read_table_chunks_single_column_splat(tmp_path, rng_np):
    # single-column tables come back squeezed from loadtxt_fast; columns=
    # must still index them
    data = rng_np.normal(size=80)
    p = tmp_path / "one_col.txt"
    np.savetxt(p, data)
    (chunk,) = list(io_stream.read_table_chunks([p], columns=(0,)))
    np.testing.assert_allclose(chunk[0], data, rtol=1e-10)


def test_ingest_stream_consumes_prefetched_directly():
    # already-prefetched iterators are NOT wrapped in a second prefetch
    # layer: the stream object must be consumed as-is
    consumed = []

    class Probe:
        def __iter__(self):
            return iter([(1.0,), (2.0,)])

    def update(state, v):
        consumed.append(v)
        return state + v

    out = io_stream.ingest_stream(update, 0.0, Probe())
    assert out == 3.0 and consumed == [1.0, 2.0]


def test_ingest_stream_fan_in_matches_sequential(rng_np):
    # fan_in groups k chunks per jitted dispatch; the folded state must be
    # identical to the one-at-a-time path, including a leftover tail
    uv = rng_np.normal(3.0, 1.0, 700)
    xv = rng_np.normal(1.0, 0.5, 700)
    chunks = [
        (uv[i * 100 : (i + 1) * 100], xv[i * 100 : (i + 1) * 100])
        for i in range(7)  # 7 chunks, fan_in=3 -> 2 groups + tail of 1
    ]
    state0, update, predict = pipeline.make_streaming_extrap_pipeline(
        3, 1.0, dtype=np.float64
    )
    seq = io_stream.ingest_stream(update, state0, iter(chunks))
    fan = io_stream.ingest_stream(update, state0, iter(chunks), fan_in=3)
    betas = np.array([0.8, 1.0, 1.2])
    np.testing.assert_allclose(
        np.asarray(predict(fan, betas)), np.asarray(predict(seq, betas)), rtol=1e-13
    )


def test_ingest_stream_fan_in_validation():
    with pytest.raises(ValueError, match="fan_in"):
        io_stream.ingest_stream(lambda s: s, 0.0, [], fan_in=0)


def test_fan_in_group_program_cached_across_calls():
    # a fresh jax.jit wrapper per ingest_stream call would recompile every
    # call on a remote compile service — the group program must be reused
    def update(state, v):
        return state + v

    assert io_stream._group_program(update) is io_stream._group_program(update)


def test_fan_in_group_program_entry_collectable():
    # the cached program must not strong-ref its key: a WeakKeyDictionary
    # value referencing the key pins the entry forever (leaked compiled
    # programs for ephemeral pipeline update closures)
    import gc
    import weakref

    def update(state, v):
        return state + v

    out = io_stream.ingest_stream(update, 0.0, [(1.0,), (2.0,), (3.0,)], fan_in=2)
    assert float(out) == 6.0
    ref = weakref.ref(update)
    del update
    gc.collect()
    assert ref() is None


def test_read_npy_chunks_matches_one_shot(tmp_path):
    """Binary chunk ingest == the one-shot pipeline over the concatenation."""
    import numpy as np

    from thermoextrap_tpu.io_stream import ingest_stream, read_npy_chunks
    from thermoextrap_tpu.pipeline import (
        make_extrap_pipeline,
        make_streaming_extrap_pipeline,
    )

    rng = np.random.default_rng(0)
    paths = []
    chunks = []
    for i in range(3):
        arr = np.column_stack(
            [rng.normal(3.0, 0.7, 500), rng.normal(1.5, 0.3, 500)]
        )
        p = tmp_path / f"chunk{i}.npy"
        np.save(p, arr)
        paths.append(p)
        chunks.append(arr)
    full = np.concatenate(chunks)

    state, update, predict = make_streaming_extrap_pipeline(
        2, 2.0, dtype=np.float64
    )
    state = ingest_stream(update, state, read_npy_chunks(paths, columns=(0, 1)))
    got = np.asarray(predict(state, np.array([1.9, 2.1])))
    ref = np.asarray(
        make_extrap_pipeline(2, 2.0)(full[:, 0], full[:, 1], np.array([1.9, 2.1]))
    )
    np.testing.assert_allclose(got, ref.reshape(got.shape), rtol=1e-12)

    # 1-D files are a single column; column selection still works
    p1 = tmp_path / "one.npy"
    np.save(p1, full[:, 0])
    (only,) = next(iter(read_npy_chunks([p1], columns=(0,))))
    np.testing.assert_array_equal(only, full[:, 0])

    # pickled object files are refused
    import pytest

    pbad = tmp_path / "bad.npy"
    np.save(pbad, np.array([{"a": 1}], dtype=object), allow_pickle=True)
    with pytest.raises(ValueError):
        list(read_npy_chunks([pbad]))
