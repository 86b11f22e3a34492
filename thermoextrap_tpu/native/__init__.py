"""Native (C++) runtime components.

Currently: a fast whitespace-delimited table loader (``loadtxt_fast``)
replacing the ``np.loadtxt`` hot path of the file-based active-learning
``DataWrapper``.  The shared library is compiled once on first use with the
system ``g++`` and cached next to the source; everything degrades gracefully
to ``np.loadtxt`` when a compiler is unavailable.
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

__all__ = ["loadtxt_fast"]

_SRC = Path(__file__).parent / "fastloader.cpp"
_LIB = None
_LIB_FAILED = False


def _cache_dir() -> Path | None:
    """Per-user 0700 cache dir; never trust a dir another user could own.

    A predictable path under the world-writable tempdir would let any
    local user pre-plant a ``fastloader_<tag>.so`` (the tag is computable
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


def _build_lib() -> Path | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:12]
    cache_dir = _cache_dir()
    if cache_dir is None:
        logger.warning(
            "no trustworthy native cache dir; using np.loadtxt fallback"
        )
        return None
    lib_path = cache_dir / f"fastloader_{tag}.so"
    if lib_path.exists():
        st = lib_path.stat()
        owned = not hasattr(os, "getuid") or st.st_uid == os.getuid()
        if owned and not (st.st_mode & (stat.S_IWGRP | stat.S_IWOTH)):
            return lib_path
        return None  # untrusted artifact: do not load, do not overwrite
    # build to a private temp name, then atomically publish
    tmp = cache_dir / f".fastloader_{tag}.{os.getpid()}.so"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", str(tmp), str(_SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.chmod(tmp, 0o500)
        os.replace(tmp, lib_path)
    except (OSError, subprocess.SubprocessError) as err:
        logger.warning("fastloader build failed (%s); using np.loadtxt", err)
        tmp.unlink(missing_ok=True)
        return None
    return lib_path


def _get_lib():
    global _LIB, _LIB_FAILED
    if _LIB is None and not _LIB_FAILED:
        path = _build_lib()
        if path is None:
            _LIB_FAILED = True
            return None
        lib = ctypes.CDLL(str(path))
        lib.ft_count.restype = ctypes.c_int
        lib.ft_count.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.ft_load.restype = ctypes.c_int
        lib.ft_load.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        _LIB = lib
    return _LIB


def loadtxt_fast(path, usecols=None):
    """Drop-in ``np.loadtxt`` for whitespace/comma-delimited float tables
    ('#' comments skipped).  ~20x faster via the C++ parser; falls back to
    ``np.loadtxt`` if the native library is unavailable."""
    lib = _get_lib()
    if lib is None:
        return np.loadtxt(path, usecols=usecols)

    cpath = str(path).encode()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    if lib.ft_count(cpath, ctypes.byref(rows), ctypes.byref(cols)) != 0:
        return np.loadtxt(path, usecols=usecols)
    out = np.empty((rows.value, cols.value), dtype=np.float64)
    rc = lib.ft_load(
        cpath,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows.value,
        cols.value,
    )
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
