"""Pure-XLA fallbacks for the native moments engine (numpy f64 outputs).

Used when no C++ toolchain is available on the host; same contracts as the
``native`` wrappers they stand in for.
"""

from __future__ import annotations

import numpy as np


def _np(out):
    return tuple(np.asarray(o) for o in out)


def reduce_central(uv, xv, order, weight, val_ndim):
    from ..ops import moments

    return _np(
        moments.reduce_central_comoments(
            uv, xv, order, weight=weight, val_ndim=val_ndim
        )
    )


def reduce_raw(uv, xv, order, weight, val_ndim):
    from ..ops import moments

    return _np(
        moments.reduce_raw_comoments(uv, xv, order, weight=weight, val_ndim=val_ndim)
    )


def resample_central(uv, xv, freq, order, weight):
    from ..ops import resample

    return _np(
        resample.resample_central_comoments(uv, xv, freq, order, weight=weight)
    )
