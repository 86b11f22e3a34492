"""Heteroscedastic-sine data generator for GP / active-learning tests
(TPU-native rebuild of /root/reference/src/thermoextrap/gpr_active/
sine_active.py)."""

from __future__ import annotations

import jax
import numpy as np

from ..utils.random import validate_rng

__all__ = ["make_data", "noise_func"]


def noise_func(x, s, n):
    """Heteroscedastic variance model ``n * (s*(x - min x) + cos(x)^2)``
    (reference sine_active.py:12-27)."""
    return n * (s * (x - np.min(x)) + np.cos(x) ** 2)


def make_data(
    x_vals,
    fac: float = 1.0,
    phase_shift: float = 0.0,
    noise: float = 0.1,
    slope: float = 0.1,
    order_scale: float = 1.0,
    max_order: int = 4,
    rng=None,
):
    """Noisy sine + derivatives with order-scaled heteroscedastic variance
    (reference sine_active.py:30-95).  Returns ``(X, Y, Y_err)`` ready for
    :class:`~thermoextrap_tpu.gpr_active.gp_models.HeteroscedasticGPR`.
    """
    key = validate_rng(rng)
    x_vals = np.atleast_1d(np.asarray(x_vals, dtype=float))

    y_vals = fac * np.sin(x_vals + phase_shift)
    y_err = (fac**2) * noise_func(x_vals, slope, noise)
    for i in range(1, max_order + 1):
        deriv = fac * (
            np.sin(x_vals + phase_shift) if i % 2 == 0 else np.cos(x_vals + phase_shift)
        )
        if i % 4 >= 2:
            deriv = -deriv
        this_noise = (fac**2) * noise_func(x_vals, slope, noise) * np.exp(
            order_scale * i
        )
        y_vals = np.hstack([y_vals, deriv])
        y_err = np.hstack([y_err, this_noise])

    x_mat = np.stack(
        [
            np.tile(x_vals, max_order + 1),
            np.repeat(np.arange(max_order + 1), x_vals.shape[0]),
        ],
        axis=1,
    )

    k1, k2 = jax.random.split(key)
    y = y_vals + np.sqrt(y_err) * np.asarray(
        jax.random.normal(k1, y_vals.shape)
    )
    y_err_noisy = y_err * np.exp(
        0.5 * (np.asarray(jax.random.uniform(k2, y_err.shape)) - 0.5)
    )
    return x_mat, y[:, None], y_err_noisy[:, None]
