"""``--smoke`` support for the example CLIs.

Passing ``--smoke`` to any example shrinks the workload and steers JAX to
the CPU backend so the examples double as fast regression tests
(tests/test_examples.py — the reference runs its notebooks the same way,
/root/reference/conftest.py:1-14).  Without the flag the examples run at
full size on whatever device is available (the real TPU under the
harness).
"""

from __future__ import annotations

import os
import sys

SMOKE = "--smoke" in sys.argv


def setup(n_devices: int | None = None) -> bool:
    """If ``--smoke`` was passed, force the CPU platform (before the first
    jax computation — env vars are too late, see tests/conftest.py) and
    optionally ``n_devices`` virtual host devices.  Returns SMOKE."""
    if not SMOKE:
        # full-size runs hit the real chip: a FRESH XLA compile through the
        # remote compile service runs 1-5 minutes per program
        # (COMPILE_CACHE.json: miss 262 s / hit 3.2 s), so persist compiles
        # across example runs
        import sys as _sys

        _sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))
        from thermoextrap_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
        return False
    if n_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    return True
