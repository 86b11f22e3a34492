"""Backend dispatch: fused Pallas kernels on TPU, XLA reference elsewhere.

The data layer calls these wrappers; they route the flat hot path
(``batch == ()``) to the fused single-pass Pallas kernels when running on an
accelerator, and fall back to the two-pass XLA implementation on CPU (where
f64 accuracy is available and Pallas TPU kernels cannot compile).

A third backend, ``"native"``, routes *concrete* (non-traced) calls to the
compiled C++ host engine (``native/cmoments.cpp`` — the cmomy/numba role):
eager numpy workflows skip JAX dispatch entirely and reduce at compiled-loop
speed in f64.  Calls made under a jit/vmap trace keep the XLA path (a host
callout cannot appear inside a compiled program), so ``set_impl("native")``
is safe to leave on globally.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from . import moments, moments_pallas, resample

_FORCE: str | None = None  # None = auto; "xla" | "pallas" | "native" for tests


def set_impl(impl: str | None) -> None:
    """Force an implementation globally (``None`` restores auto)."""
    global _FORCE
    if impl not in (None, "xla", "pallas", "native"):
        msg = f"impl must be None, 'xla', 'pallas' or 'native'; got {impl!r}"
        raise ValueError(msg)
    _FORCE = impl


@contextlib.contextmanager
def use_impl(impl: str | None):
    """Scoped :func:`set_impl`: force a backend inside a ``with`` block and
    restore the previous setting on exit (exception-safe).

    >>> with use_impl("xla"):
    ...     pass  # calls in here take the XLA path
    """
    prev = _FORCE
    set_impl(impl)
    try:
        yield
    finally:
        set_impl(prev)


def _use_native(*arrays) -> bool:
    """True when the forced native backend can serve this call: every operand
    must be concrete (host-transferable) — tracers fall through to XLA."""
    if _FORCE != "native":
        return False
    return not any(isinstance(a, jax.core.Tracer) for a in arrays if a is not None)


def _use_pallas() -> bool:
    if _FORCE == "pallas":
        return True
    if _FORCE == "xla":
        return False
    # respect an active jax.default_device(cpu) context (e.g. the host-f64
    # linear-algebra context): Pallas TPU kernels cannot lower on CPU
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", "cpu") != "cpu"
    return jax.default_backend() != "cpu"


def reduce_central(uv, xv, order, weight=None, val_ndim=1, x_is_u=False):
    if _use_native(uv, xv, weight):
        # comoments of (u, u-shaped x) already satisfy the x_is_u contract
        # (dxdu[n] = du[n+1]); no special routing needed off-accelerator
        from .. import native

        return native.reduce_central_comoments(
            uv, xv, order, weight=weight, val_ndim=val_ndim
        )
    flat = getattr(uv, "ndim", 1) == 1
    if _use_pallas():
        # Weights stay f32 even for bf16 sample streams — the kernels
        # accumulate in f32 and a bf16 weight quantization would be a
        # silent accuracy loss for no bandwidth win (weights are one
        # stream of several).
        w = (
            None
            if weight is None
            else jnp.broadcast_to(
                jnp.asarray(weight, jnp.float32), jnp.shape(uv)
            )
        )
        # x == u (the lnPi layout, flat or macrostate-grid batched):
        # u-moments only via the batched kernel — HALF the stream traffic
        # of running the comoment kernel on two copies of u (order+1 for
        # the dxdu = du[n+1] shift view).  The explicit flag matters:
        # `xv is uv` is identity-based and always False once traced
        # through jit/vmap (pytree flatten yields distinct tracers), so
        # callers inside jit MUST thread x_is_u explicitly.
        if x_is_u or xv is uv:
            uave, du_full = moments_pallas.reduce_central_umoments_batched_ad(
                uv, w, order + 1
            )
            return uave, uave, du_full[: order + 1], du_full[1 : order + 2]
        if flat:
            # custom-VJP wrapper: autodiff flows through the fused kernel
            return moments_pallas.reduce_central_comoments_fused_ad(
                uv, xv, w, order
            )
        # batched x != u: fused comoment kernel over (batch, rec blocks)
        return moments_pallas.reduce_central_comoments_batched_ad(
            uv, xv, w, order
        )
    return moments.reduce_central_comoments(
        uv, xv, order, weight=weight, val_ndim=val_ndim
    )


def reduce_raw(uv, xv, order, weight=None, val_ndim=1):
    if _use_native(uv, xv, weight) and getattr(uv, "ndim", 1) == 1:
        from .. import native

        return native.reduce_raw_comoments(
            uv, xv, order, weight=weight, val_ndim=val_ndim
        )
    # raw moments are only numerically sensible in f64 / for parity paths;
    # keep the XLA implementation everywhere on-device.
    return moments.reduce_raw_comoments(
        uv, xv, order, weight=weight, val_ndim=val_ndim
    )


def resample_central(uv, xv, freq, order, weight=None):
    if _use_native(uv, xv, freq, weight):
        from .. import native

        return native.resample_central_comoments(uv, xv, freq, order, weight=weight)
    if _use_pallas():
        return moments_pallas.resample_central_comoments_fused_ad(
            uv, xv, freq, order, weight
        )
    return resample.resample_central_comoments(uv, xv, freq, order, weight=weight)
