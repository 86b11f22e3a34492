"""Persistent XLA compilation cache (cold-start amortization).

On the axon-tunneled TPU backend a cold compile of a nontrivial jitted
program runs through a remote compile service and can take minutes
(BENCH_GPR.json: staging_cold 49-326 s observed).  jax's persistent
compilation cache works on this backend — measured 262 s -> 3.2 s (81x)
for the cold XLA staging program and ~2.8x for Pallas custom-call
programs (benches/bench_compile_cache.py, COMPILE_CACHE.json) — so
enabling it once per process amortizes every cold start across
processes and restarts.

Opt-in (it mutates global jax config and writes to disk):

    from thermoextrap_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()          # ~/.cache/thermoextrap_tpu/xla
    enable_compilation_cache("/fast/disk/cache")
"""

from __future__ import annotations

import os
from pathlib import Path

__all__ = ["enable_compilation_cache"]

_DEFAULT = Path(
    os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache")
) / "thermoextrap_tpu" / "xla"


def enable_compilation_cache(path: str | os.PathLike | None = None) -> Path:
    """Enable jax's persistent compilation cache at ``path`` and return it.

    Safe to call more than once; the last path wins.  Entries are written
    for every compile that takes >= 1 s (jax's default threshold keeps
    trivial programs out of the cache).
    """
    import jax

    cache_dir = Path(path) if path is not None else _DEFAULT
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    return cache_dir
