"""Prefetching ingest runtime: overlap host IO/parsing with device compute.

Framework role: the data-loader runtime around the streaming pipelines.  A
bounded-depth background prefetcher parses trajectory chunks on a worker
thread (the C++ ``native.loadtxt_fast`` parser for text tables), optionally
stages them onto a device ahead of use, and hands the consumer a plain
iterator — so the jitted ``update`` step of
:func:`pipeline.make_streaming_extrap_pipeline` runs concurrently with the
parse + host→device transfer of the *next* chunk (jax dispatch is
asynchronous; ``jax.device_put`` overlaps with compute).

No reference analogue: the reference loads complete timeseries up front
(``DataWrapper.get_data``, /root/reference/src/thermoextrap/gpr_active/
active_utils.py:173-258) and reduces them in one shot.
"""

from __future__ import annotations

import queue
import threading
import weakref

__all__ = [
    "ingest_stream",
    "prefetch_chunks",
    "read_npy_chunks",
    "read_table_chunks",
]

_END = ("end", None)

# fan-in group programs, cached per update callable: jit re-traces per group
# pytree structure (i.e. per fan_in and chunk arity) but a fresh jax.jit
# wrapper per ingest_stream call would RECOMPILE on every call (~seconds on a
# remote compile service) — the cache key must outlive the call
_GROUP_JITS: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def _group_program(update):
    import jax

    cacheable = True
    try:
        prog = _GROUP_JITS.get(update)
    except TypeError:  # unweakrefable callable: build fresh (correct, uncached)
        prog = None
        cacheable = False

    if prog is not None:
        return prog

    if cacheable:
        try:
            uref = weakref.ref(update)
        except TypeError:
            cacheable = False

    if cacheable:
        # the closure must NOT strong-ref `update`: the cached program is
        # the WeakKeyDictionary VALUE, and a value referencing its key pins
        # the entry forever (ephemeral pipeline closures would leak their
        # compiled programs).  The caller holds `update` for the duration
        # of every call, so the weakref is always live when tracing runs;
        # once the caller drops it, entry + program are collected together.
        def _update_group(st, group):
            u = uref()
            if u is None:  # pragma: no cover - caller always holds update
                msg = "ingest_stream update callable was garbage-collected"
                raise RuntimeError(msg)
            for ch in group:
                st = u(st, *ch)
            return st

        prog = jax.jit(_update_group)
        _GROUP_JITS[update] = prog
    else:

        def _update_group(st, group):
            for ch in group:
                st = update(st, *ch)
            return st

        prog = jax.jit(_update_group)
    return prog


def prefetch_chunks(sources, load=None, depth: int = 2, device=None):
    """Iterate ``load(source)`` for each source, computed ahead on a worker
    thread.

    Parameters
    ----------
    sources : iterable
        Work items (file paths, chunk ids, closures...).  Consumed lazily.
    load : callable, optional
        Applied to each source on the worker thread (defaults to identity).
        This is where file parsing / preprocessing should happen.
    depth : int
        Maximum number of loaded-but-unconsumed chunks (bounded memory;
        ``depth=2`` double-buffers).
    device : optional
        If given, each loaded chunk (a pytree of arrays) is staged with
        ``jax.device_put(..., device)`` on the worker thread, overlapping
        the transfer with the consumer's compute.

    Yields
    ------
    The loaded chunks, in source order.  An exception raised by ``load``
    (or the sources iterator) propagates to the consumer at the point of
    consumption.  Abandoning the iterator (``close`` / garbage collection)
    stops the worker promptly.
    """
    if depth < 1:
        msg = f"depth must be >= 1; got {depth}"
        raise ValueError(msg)
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded-blocking put that stays responsive to consumer abandon
        while not stop.is_set():
            try:
                q.put(item, timeout=0.05)
            except queue.Full:
                continue
            return True
        return False

    def _worker() -> None:
        try:
            for src in sources:
                if stop.is_set():
                    return
                item = load(src) if load is not None else src
                if device is not None:
                    import jax

                    item = jax.device_put(item, device)
                if not _put(("item", item)):
                    return
        except BaseException as err:  # noqa: BLE001 - relayed to the consumer
            _put(("err", err))
        else:
            _put(_END)

    worker = threading.Thread(target=_worker, daemon=True, name="xtpu-prefetch")
    worker.start()
    try:
        while True:
            kind, val = q.get()
            if kind == "end":
                return
            if kind == "err":
                raise val
            yield val
    finally:
        stop.set()


def read_table_chunks(paths, usecols=None, columns=None, depth: int = 2, device=None):
    """Prefetched iterator over whitespace/comma tables (one chunk per file),
    parsed with the native C++ loader (:func:`native.loadtxt_fast`).

    ``columns``: optional tuple of column selectors — each chunk is then
    yielded as ``tuple(table[:, c] for c in columns)``, ready to splat into
    a streaming-pipeline ``update(state, uv, xv)`` via
    :func:`ingest_stream` (e.g. ``columns=(0, 1)`` for a ``u x`` table).
    """
    from . import native

    def _load(p):
        table = native.loadtxt_fast(p, usecols=usecols)
        if columns is None:
            return table
        if table.ndim == 1:  # single-column tables come back squeezed
            table = table[:, None]
        return tuple(table[:, c] for c in columns)

    return prefetch_chunks(paths, load=_load, depth=depth, device=device)


def read_npy_chunks(paths, columns=None, depth: int = 2, device=None):
    """Prefetched iterator over ``.npy`` chunk files (one chunk per file) —
    the binary production-format counterpart of :func:`read_table_chunks`
    (a ``.npy`` read is a header parse + one contiguous read, so ingest
    runs at storage speed instead of text-parse speed).

    ``columns`` as in :func:`read_table_chunks`: yield
    ``tuple(arr[:, c] for c in columns)`` ready to splat into a streaming
    ``update`` (1-D files are treated as a single column).  Object arrays
    are rejected (``allow_pickle=False``).
    """
    import numpy as np

    def _load(p):
        arr = np.load(p, allow_pickle=False)
        if columns is None:
            return arr
        if arr.ndim == 1:
            arr = arr[:, None]
        return tuple(np.ascontiguousarray(arr[:, c]) for c in columns)

    return prefetch_chunks(paths, load=_load, depth=depth, device=device)


def ingest_stream(
    update, state, chunks, depth: int = 2, load=None, device=None, fan_in: int = 1
):
    """Fold a streaming-pipeline ``update`` over a prefetched chunk stream.

    ``update(state, *chunk) -> state`` (chunks that are tuples/lists are
    splatted; anything else is passed as a single argument).  Returns the
    final state.  Because ``update`` is jitted and jax dispatch is
    asynchronous, each chunk's reduction overlaps the parse/transfer of the
    next one.

    ``chunks`` may be raw sources (give ``load``/``device`` to prefetch
    them here) or an already-prefetched iterator such as
    :func:`read_table_chunks` — with no ``load``/``device`` the stream is
    consumed directly rather than wrapped in a second prefetch layer.

    ``fan_in > 1`` folds that many chunks per jitted dispatch (the inner
    ``update`` traces inline into one compiled program over a tuple of
    chunk buffers).  On a remote-dispatch backend each call pays a fixed
    ~5-25 ms tunnel overhead, which dominates small-chunk streams
    (BENCH_PIPELINE.json ``streaming_update``: 26 ms apparent per 12.5M
    f32 chunk vs ~1.6 ms of device time); fan-in divides that overhead by
    ``fan_in``.  Chunk shapes must repeat for the group program to compile
    once (one compile per distinct shape combination); the leftover tail
    (< ``fan_in`` chunks) reuses the single-chunk path.  The group program
    is cached per ``update`` callable (module-level, weakly keyed), so
    repeated ``ingest_stream`` calls with the same ``update`` reuse one
    compiled program; ``update`` must be jax-traceable when ``fan_in > 1``.
    """
    if fan_in < 1:
        msg = f"fan_in must be >= 1; got {fan_in}"
        raise ValueError(msg)
    if load is None and device is None:
        stream = chunks
    else:
        stream = prefetch_chunks(chunks, load=load, depth=depth, device=device)
    if fan_in == 1:
        for chunk in stream:
            if isinstance(chunk, (tuple, list)):
                state = update(state, *chunk)
            else:
                state = update(state, chunk)
        return state

    _update_group = _group_program(update)

    buf: list[tuple] = []
    for chunk in stream:
        buf.append(tuple(chunk) if isinstance(chunk, (tuple, list)) else (chunk,))
        if len(buf) == fan_in:
            state = _update_group(state, tuple(buf))
            buf.clear()
    for ch in buf:
        state = update(state, *ch)
    return state
