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
import subprocess
import tempfile
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["loadtxt_fast"]

_SRC = Path(__file__).parent / "fastloader.cpp"
_LIB = None
_LIB_FAILED = False


def _build_lib() -> Path | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:12]
    cache_dir = Path(tempfile.gettempdir()) / "thermoextrap_tpu_native"
    cache_dir.mkdir(parents=True, exist_ok=True)
    lib_path = cache_dir / f"fastloader_{tag}.so"
    if lib_path.exists():
        return lib_path
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", str(lib_path), str(_SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError) as err:
        logger.warning("fastloader build failed (%s); using np.loadtxt", err)
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
