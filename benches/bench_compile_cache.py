"""Persistent-compilation-cache experiment for the axon backend
(VERDICT r2 item 7: BENCH_GPR cold staging was 49-326 s; a persistent
jax compilation cache would amortize it across processes IF the backend
supports it).

Three subprocess stages, each compiling the same two programs cold:

- ``--stage miss``: fresh cache dir -> compile (populates the cache).
- ``--stage hit``:  same cache dir  -> compile (hit if supported).
- ``--stage none``: no cache configured (control).

Programs: a pure-XLA jit (series-engine + reduction epilogue shapes) and
the fused Pallas kernel (tpu_custom_call) — the cache may treat custom
calls differently.  Writes COMPILE_CACHE.json with the three timings per
program and the verdict.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

CACHE_DIR = Path(tempfile.gettempdir()) / "xtpu_compile_cache_probe"


def stage(which: str) -> None:
    import jax

    if which in ("miss", "hit"):
        jax.config.update("jax_compilation_cache_dir", str(CACHE_DIR))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    from thermoextrap_tpu.ops.moments_pallas import (
        reduce_central_comoments_fused,
    )

    r = 1_048_576
    u = jnp.ones((r,), jnp.float32)
    x = jnp.ones((r,), jnp.float32)

    @jax.jit
    def xla_prog(u, x):
        du = u - u.mean()
        dx = x - x.mean()
        acc = 0.0
        p = du
        for n in range(2, 7):
            p = p * du
            acc = acc + p.mean() + (p * dx).mean() * n
        return acc

    t0 = time.perf_counter()
    float(xla_prog(u, x))
    t_xla = time.perf_counter() - t0

    t0 = time.perf_counter()
    float(reduce_central_comoments_fused(u, x, 6)[2][2])
    t_pallas = time.perf_counter() - t0

    print(json.dumps({"xla_s": round(t_xla, 2), "pallas_s": round(t_pallas, 2)}))


def main() -> None:
    if CACHE_DIR.exists():
        shutil.rmtree(CACHE_DIR)
    results = {"metric": "axon_persistent_compile_cache_probe"}
    for which in ("miss", "hit", "none"):
        proc = subprocess.run(
            [sys.executable, __file__, "--stage", which],
            capture_output=True,
            text=True,
            timeout=1800,
            check=False,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
        try:
            results[which] = json.loads(line)
        except Exception:
            results[which] = {"error": proc.stderr.strip()[-300:]}
    entries = (
        len(list(CACHE_DIR.rglob("*"))) if CACHE_DIR.exists() else 0
    )
    results["cache_entries_written"] = entries
    try:
        hit, miss = results["hit"], results["miss"]
        speedup_xla = round(miss["xla_s"] / max(hit["xla_s"], 1e-9), 1)
        speedup_pallas = round(
            miss["pallas_s"] / max(hit["pallas_s"], 1e-9), 1
        )
        results["xla_hit_speedup"] = speedup_xla
        results["pallas_hit_speedup"] = speedup_pallas
        results["supported"] = bool(
            entries > 0 and (speedup_xla > 2 or speedup_pallas > 2)
        )
    except Exception:
        results["supported"] = False
    Path(__file__).parent.parent.joinpath("COMPILE_CACHE.json").write_text(
        json.dumps(results, indent=1)
    )
    print(json.dumps(results))


if __name__ == "__main__":
    if "--stage" in sys.argv:
        stage(sys.argv[sys.argv.index("--stage") + 1])
    else:
        main()
