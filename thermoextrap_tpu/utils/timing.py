"""Honest device-rate timing for remote/async accelerator backends.

The methodology every committed bench artifact uses (BENCH_KERNELS.json,
HBM_ROOF.json, ...), packaged as a reusable utility.  Naive wall-clock
timing lies on this class of backend twice over: dispatch+tunnel overhead
dominates single calls, and ``block_until_ready`` does not reliably wait
on the axon tunnel.  The fix:

1. chain ``K`` *dependent* invocations of the step inside ONE jitted
   ``lax.fori_loop`` (the carried arrays form a data dependency, so the
   device must execute all K sequentially; the trip count is traced, so
   one compile serves every K);
2. synchronize by fetching a scalar from the result (not
   ``block_until_ready``);
3. difference two chain lengths (``K_hi - K_lo``) to subtract dispatch,
   transfer, and sync costs exactly.

Caveat (measured, CLAUDE.md): deltas under ~20-25 ms through the tunnel
are noise-dominated — pick ``k_hi`` large enough that the *difference* is
well above that, or trust nothing.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

__all__ = ["kchain_time"]


def kchain_time(step, args, k_lo: int = 4, k_hi: int = 20, reps: int = 3):
    """Per-invocation seconds of ``step`` on the device, K-chain differenced.

    Parameters
    ----------
    step : callable
        ``step(*args) -> args_like`` — returns a tuple/pytree with the
        SAME structure and shapes as ``args`` (it is the fori_loop carry).
        A single-array step may return the bare array.
    args : tuple
        Initial operands (will be device-committed before timing).
    k_lo, k_hi : chain lengths to difference.  ``k_hi - k_lo`` steps pay
        zero dispatch/sync overhead; make the time difference >~ 25 ms.
    reps : best-of repetitions per chain length (min is taken per length
        BEFORE differencing — min(hi) - min(lo) on a quiet device).

    Returns
    -------
    ``(seconds_per_step, result)`` — the differenced per-invocation time
    and the K_hi chain's final output (for correctness checks).
    """
    if k_hi <= k_lo:
        msg = f"need k_hi > k_lo; got {k_lo=}, {k_hi=}"
        raise ValueError(msg)
    args = tuple(jax.device_put(a) for a in args)

    def body(_i, a):
        out = step(*a)
        return out if isinstance(out, tuple) else (out,)

    @jax.jit
    def chain(k, a):
        return jax.lax.fori_loop(0, k, body, a)

    def _sync(out):
        # fetch one scalar per output leaf: the only reliable barrier on
        # tunneled backends (block_until_ready returns early there)
        for leaf in jax.tree_util.tree_leaves(out):
            _ = float(jnp.asarray(leaf).ravel()[0])
        return out

    # warm both trip counts (one compile: k is traced) + commit inputs
    _sync(chain(k_lo, args))
    result = _sync(chain(k_hi, args))

    times = {}
    for k in (k_lo, k_hi):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _sync(chain(k, args))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    dt = times[k_hi] - times[k_lo]
    if dt < 0.025:
        # measured on this backend (CLAUDE.md): narrow-spread deltas under
        # ~25 ms produced 2-4x inflated rates (min-differencing bias) —
        # the returned number is NOT trustworthy at this delta
        import warnings

        warnings.warn(
            f"kchain_time delta {dt * 1e3:.1f} ms is below the ~25 ms "
            "tunnel noise floor; raise k_hi or the per-step work before "
            "trusting this rate",
            stacklevel=2,
        )
    return dt / (k_hi - k_lo), result
