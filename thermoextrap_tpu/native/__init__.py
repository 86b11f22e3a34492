"""Native (C++) runtime components.

Two compiled host-side engines, each built once on first use with the
system ``g++`` and cached in a per-uid directory; everything degrades
gracefully to a pure-Python/XLA fallback when a compiler is unavailable:

- ``fastloader.cpp`` — whitespace-delimited table loader
  (:func:`loadtxt_fast`) replacing the ``np.loadtxt`` hot path of the
  file-based active-learning ``DataWrapper``.
- ``cmoments.cpp`` — central/raw comoment reduction + freq-table
  bootstrap kernels: the compiled-CPU role cmomy's numba kernels play for
  the reference package (/root/reference/src/thermoextrap/data.py:455-536,
  1750-1813).  Serves eager host workflows (numpy trajectories, f64
  ingest, CPU-only deployments) without JAX dispatch/trace overhead;
  routed by ``ops.dispatch.set_impl("native")`` for concrete host arrays.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import stat
import subprocess
import tempfile
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "available",
    "loadtxt_fast",
    "reduce_central_comoments",
    "reduce_raw_comoments",
    "resample_central_comoments",
]

_HERE = Path(__file__).parent
_LIBS: dict[str, object] = {}  # name -> CDLL, or None after a failed build

_i64 = ctypes.c_int64
_dp = ctypes.POINTER(ctypes.c_double)


def _cache_dir() -> Path | None:
    """Per-user 0700 cache dir; never trust a dir another user could own.

    A predictable path under the world-writable tempdir would let any
    local user pre-plant a ``<name>_<tag>.so`` (the tag is computable
    from the public source) that ``ctypes.CDLL`` would then execute in
    this process — so the directory is keyed by uid, created 0700, and
    rejected unless owned by us with no group/other write bits.
    """
    uid = os.getuid() if hasattr(os, "getuid") else 0
    d = Path(tempfile.gettempdir()) / f"thermoextrap_tpu_native_{uid}"
    try:
        d.mkdir(parents=True, exist_ok=True, mode=0o700)
        if d.is_symlink():
            return None
        st = d.stat()
        owned = not hasattr(os, "getuid") or st.st_uid == os.getuid()
        safe_mode = not (st.st_mode & (stat.S_IWGRP | stat.S_IWOTH))
        if not (d.is_dir() and owned and safe_mode):
            return None
    except OSError:
        return None
    return d


def _build_lib(src: Path) -> Path | None:
    source = src.read_bytes()
    tag = hashlib.sha256(source).hexdigest()[:12]
    cache_dir = _cache_dir()
    if cache_dir is None:
        logger.warning("no trustworthy native cache dir; using fallback for %s", src.name)
        return None
    lib_path = cache_dir / f"{src.stem}_{tag}.so"
    if lib_path.exists():
        st = lib_path.stat()
        owned = not hasattr(os, "getuid") or st.st_uid == os.getuid()
        if owned and not (st.st_mode & (stat.S_IWGRP | stat.S_IWOTH)):
            return lib_path
        return None  # untrusted artifact: do not load, do not overwrite
    # build to a private temp name, then atomically publish
    tmp = cache_dir / f".{src.stem}_{tag}.{os.getpid()}.so"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", str(tmp), str(src),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.chmod(tmp, 0o500)
        os.replace(tmp, lib_path)
    except (OSError, subprocess.SubprocessError) as err:
        logger.warning("%s build failed (%s); using fallback", src.name, err)
        tmp.unlink(missing_ok=True)
        return None
    return lib_path


def _get_lib(name: str, declare):
    """Build+load ``<name>.cpp`` once; ``declare(lib)`` sets ctypes prototypes."""
    if name not in _LIBS:
        path = _build_lib(_HERE / f"{name}.cpp")
        if path is None:
            _LIBS[name] = None
        else:
            lib = ctypes.CDLL(str(path))
            declare(lib)
            _LIBS[name] = lib
    return _LIBS[name]


def available() -> bool:
    """True if the compiled moments engine is usable on this host."""
    return _cmoments() is not None


# ---------------------------------------------------------------- fastloader


def _declare_fastloader(lib) -> None:
    lib.ft_count.restype = ctypes.c_int
    lib.ft_count.argtypes = [ctypes.c_char_p, ctypes.POINTER(_i64), ctypes.POINTER(_i64)]
    lib.ft_load.restype = ctypes.c_int
    lib.ft_load.argtypes = [ctypes.c_char_p, _dp, _i64, _i64]


def loadtxt_fast(path, usecols=None):
    """Drop-in ``np.loadtxt`` for whitespace/comma-delimited float tables
    ('#' comments skipped).  ~20x faster via the C++ parser; falls back to
    ``np.loadtxt`` if the native library is unavailable."""
    lib = _get_lib("fastloader", _declare_fastloader)
    if lib is None:
        return np.loadtxt(path, usecols=usecols)

    cpath = str(path).encode()
    rows = _i64()
    cols = _i64()
    if lib.ft_count(cpath, ctypes.byref(rows), ctypes.byref(cols)) != 0:
        return np.loadtxt(path, usecols=usecols)
    out = np.empty((rows.value, cols.value), dtype=np.float64)
    rc = lib.ft_load(cpath, out.ctypes.data_as(_dp), rows.value, cols.value)
    if rc != 0:
        return np.loadtxt(path, usecols=usecols)
    # column selection must happen BEFORE the single-column squeeze so a
    # requested out-of-range column raises like np.loadtxt instead of
    # silently returning the whole (only) column
    if usecols is not None:
        out = out[:, usecols]
    if out.ndim == 2 and out.shape[1] == 1:
        out = out[:, 0]
    return out


# ----------------------------------------------------------------- cmoments


def _declare_cmoments(lib) -> None:
    lib.cm_reduce_central.restype = ctypes.c_int
    lib.cm_reduce_central.argtypes = [_dp, _dp, _dp, _i64, _i64, _i64, _dp, _dp, _dp, _dp]
    lib.cm_reduce_central_batched.restype = ctypes.c_int
    lib.cm_reduce_central_batched.argtypes = [
        _dp, _dp, _dp, _i64, _i64, _i64, _i64, _dp, _dp, _dp, _dp,
    ]
    lib.cm_reduce_raw.restype = ctypes.c_int
    lib.cm_reduce_raw.argtypes = [_dp, _dp, _dp, _i64, _i64, _i64, _dp, _dp]
    lib.cm_resample_central.restype = ctypes.c_int
    lib.cm_resample_central.argtypes = [
        _dp, _dp, _dp, _dp, _i64, _i64, _i64, _i64, _dp, _dp, _dp, _dp,
    ]


def _cmoments():
    return _get_lib("cmoments", _declare_cmoments)


def _as_f64(a):
    return np.ascontiguousarray(np.asarray(a, dtype=np.float64))


def _buf(a):
    return a.ctypes.data_as(_dp)


def _wbuf(uv, weight):
    """Weight buffer broadcast to ``uv.shape``, or a NULL pointer."""
    if weight is None:
        return None, ctypes.cast(None, _dp)
    w = np.ascontiguousarray(
        np.broadcast_to(np.asarray(weight, dtype=np.float64), uv.shape)
    )
    return w, _buf(w)  # keep `w` alive alongside its pointer


def _check(rc: int, what: str) -> None:
    # zero-total-weight streams do not error: the C kernels emit the XLA
    # 0/0 convention (NaN means, pinned-trivial du[0]/du[1]/dxdu[0]) so the
    # native backend is a drop-in for the XLA path on every input
    if rc != 0:
        msg = f"{what}: native kernel error {rc}"
        raise RuntimeError(msg)


def _split_shapes(uv, xv, val_ndim: int):
    batch = uv.shape[:-1]
    nrec = uv.shape[-1]
    val_shape = xv.shape[uv.ndim :]
    if val_ndim != len(val_shape) or xv.shape[: uv.ndim] != uv.shape:
        msg = f"{val_ndim=} inconsistent with xv shape {xv.shape} and uv shape {uv.shape}"
        raise ValueError(msg)
    return batch, nrec, val_shape


def reduce_central_comoments(uv, xv, order: int, weight=None, val_ndim: int = 1):
    """Compiled host two-pass central comoment reduction.

    Same contract as :func:`ops.moments.reduce_central_comoments`
    (``uv (*batch, R)``, ``xv (*batch, R, *val)`` → ``(xave, uave, du,
    dxdu)`` with the moment order leading), computed in f64 by the C++
    engine; numpy outputs.  Falls back to the XLA implementation when the
    native library is unavailable.  A zero-total-weight stream (or batch
    row) yields the XLA 0/0 convention: NaN means/moments with the
    ``du[0]=1, du[1]=0, dxdu[0]=0`` pins intact.
    """
    lib = _cmoments()
    if lib is None:
        from . import _xla_fallback

        return _xla_fallback.reduce_central(uv, xv, order, weight, val_ndim)
    uv = _as_f64(uv)
    xv = _as_f64(xv)
    batch, nrec, val_shape = _split_shapes(uv, xv, val_ndim)
    nval = int(np.prod(val_shape, dtype=np.int64)) if val_shape else 1
    w, wp = _wbuf(uv, weight)
    n1 = order + 1

    if not batch:
        uave = np.empty((), np.float64)
        xave = np.empty(nval, np.float64)
        du = np.empty(n1, np.float64)
        dxdu = np.empty((n1, nval), np.float64)
        rc = lib.cm_reduce_central(
            _buf(uv), _buf(xv), wp, nrec, nval, order,
            _buf(uave), _buf(xave), _buf(du), _buf(dxdu),
        )
        _check(rc, "reduce_central_comoments")
        return (
            xave.reshape(val_shape),
            uave,  # 0-d array, matching the XLA path's scalar-shaped uave
            du,
            dxdu.reshape((n1, *val_shape)),
        )

    nb = int(np.prod(batch, dtype=np.int64))
    uvf = uv.reshape(nb, nrec)
    xvf = xv.reshape(nb, nrec, nval)
    uave = np.empty(nb, np.float64)
    xave = np.empty((nb, nval), np.float64)
    du = np.empty((nb, n1), np.float64)
    dxdu = np.empty((nb, n1, nval), np.float64)
    rc = lib.cm_reduce_central_batched(
        _buf(uvf), _buf(xvf), wp, nb, nrec, nval, order,
        _buf(uave), _buf(xave), _buf(du), _buf(dxdu),
    )
    _check(rc, "reduce_central_comoments")
    return (
        xave.reshape(batch + val_shape),
        uave.reshape(batch),
        np.moveaxis(du, -1, 0).reshape((n1, *batch)),
        np.moveaxis(dxdu, 1, 0).reshape((n1, *batch, *val_shape)),
    )


def reduce_raw_comoments(uv, xv, order: int, weight=None, val_ndim: int = 1):
    """Compiled host raw comoment reduction (flat ``batch=()`` path).

    Same contract as :func:`ops.moments.reduce_raw_comoments`:
    ``u[n] = <w u^n>/<w>`` ``(order+1,)``, ``xu[n] = <w x u^n>/<w>``
    ``(order+1, *val)``; numpy f64 outputs.
    """
    lib = _cmoments()
    if lib is None:
        from . import _xla_fallback

        return _xla_fallback.reduce_raw(uv, xv, order, weight, val_ndim)
    uv = _as_f64(uv)
    xv = _as_f64(xv)
    batch, nrec, val_shape = _split_shapes(uv, xv, val_ndim)
    if batch:
        from . import _xla_fallback

        return _xla_fallback.reduce_raw(uv, xv, order, weight, val_ndim)
    nval = int(np.prod(val_shape, dtype=np.int64)) if val_shape else 1
    w, wp = _wbuf(uv, weight)
    n1 = order + 1
    u = np.empty(n1, np.float64)
    xu = np.empty((n1, nval), np.float64)
    rc = lib.cm_reduce_raw(_buf(uv), _buf(xv), wp, nrec, nval, order, _buf(u), _buf(xu))
    _check(rc, "reduce_raw_comoments")
    return u, xu.reshape((n1, *val_shape))


def resample_central_comoments(uv, xv, freq, order: int, weight=None):
    """Compiled host freq-table bootstrap: exact two-pass central comoments
    per replicate (weight ``freq[rep, r] * w[r]``).

    Same contract as :func:`ops.resample.resample_central_comoments`:
    ``uv (R,)``, ``xv (R, *val)``, ``freq (nrep, R)`` → ``(xave (nrep,
    *val), uave (nrep,), du (order+1, nrep), dxdu (order+1, nrep, *val))``;
    all-zero replicate rows get the degenerate global-mean stand-in
    (ops/resample.py:107-119).  Numpy f64 outputs.
    """
    lib = _cmoments()
    if lib is None:
        from . import _xla_fallback

        return _xla_fallback.resample_central(uv, xv, freq, order, weight)
    uv = _as_f64(uv)
    xv = _as_f64(xv)
    freq = _as_f64(freq)
    if uv.ndim != 1 or freq.ndim != 2 or freq.shape[1] != uv.shape[0]:
        msg = f"flat bootstrap needs uv (R,), freq (nrep, R); got {uv.shape}, {freq.shape}"
        raise ValueError(msg)
    val_shape = xv.shape[1:]
    nval = int(np.prod(val_shape, dtype=np.int64)) if val_shape else 1
    nrec = uv.shape[0]
    nrep = freq.shape[0]
    w, wp = _wbuf(uv, weight)
    n1 = order + 1
    uave = np.empty(nrep, np.float64)
    xave = np.empty((nrep, nval), np.float64)
    du = np.empty((nrep, n1), np.float64)
    dxdu = np.empty((nrep, n1, nval), np.float64)
    rc = lib.cm_resample_central(
        _buf(uv), _buf(xv), wp, _buf(freq), nrep, nrec, nval, order,
        _buf(uave), _buf(xave), _buf(du), _buf(dxdu),
    )
    _check(rc, "resample_central_comoments")
    return (
        xave.reshape((nrep, *val_shape)),
        uave,
        np.moveaxis(du, -1, 0),
        np.moveaxis(dxdu, 1, 0).reshape((n1, nrep, *val_shape)),
    )
