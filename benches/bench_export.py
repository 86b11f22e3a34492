"""Serving latency of AOT export artifacts (serving_export.py).

Measures, for a β-extrap artifact (order 4, nrep=64) on the CURRENT
backend:

- ``load_exported`` wall-clock (deserialize only — no tracing),
- first-call compile per concrete input shape (the cost the bucketed
  runner / persistent compile cache bounds),
- warm-call latency per shape,
- the same for a streaming bundle's update/predict.

Writes EXPORT_SERVING.json.  CPU numbers contextualize the docstring's
"compiles once per concrete shape" guidance; on the TPU backend the
compile goes through the remote service (slower cold, same warm story).
"""

import json
import time
from pathlib import Path


def main():
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import numpy as np

    from thermoextrap_tpu import serving_export as se

    rng = np.random.default_rng(0)
    out = {}

    art = se.export_extrap_pipeline(order=4, beta0=1.0, nrep=64)
    path = Path("/tmp/bench_export_art.bin")
    art.save(path)
    out["artifact_bytes"] = path.stat().st_size

    t0 = time.perf_counter()
    art2 = se.load_exported(path)
    out["load_s"] = time.perf_counter() - t0

    betas = np.array([0.8, 1.0, 1.2], np.float32)
    shape_rows = []
    for r in (4096, 5000, 65536):
        uv = rng.normal(5, 1, r).astype(np.float32)
        xv = rng.normal(2, 0.4, (r, 1)).astype(np.float32)
        t0 = time.perf_counter()
        pred, std = art2(uv, xv, betas)
        _ = float(np.asarray(pred)[0, 0])
        cold = time.perf_counter() - t0
        warm = min(
            _timed(lambda: art2(uv, xv, betas)) for _ in range(5)
        )
        shape_rows.append({"R": r, "first_call_s": cold, "warm_call_s": warm})
    out["extrap_shapes"] = shape_rows

    sart = se.export_streaming_extrap_pipeline(2, 1.0)
    spath = Path("/tmp/bench_export_stream.bin")
    sart.save(spath)
    t0 = time.perf_counter()
    sart2 = se.load_exported(spath)
    out["stream_load_s"] = time.perf_counter() - t0
    st = sart2.init_state()
    uv = rng.normal(2, 1, 8192).astype(np.float32)
    xv = (2 * uv).astype(np.float32)
    t0 = time.perf_counter()
    st = sart2.update(st, uv, xv)
    _ = float(np.asarray(st[0]))
    out["stream_update_first_s"] = time.perf_counter() - t0
    out["stream_update_warm_s"] = min(
        _timed(lambda: sart2.update(st, uv, xv)) for _ in range(5)
    )

    import jax

    out["backend"] = jax.default_backend()
    out["metric"] = "export_artifact_serving_latency"
    print(json.dumps(out))
    # one artifact per backend: the multi-platform ("cpu","tpu") exports are
    # validated and timed on BOTH (EXPORT_SERVING.json = cpu reference,
    # EXPORT_SERVING_TPU.json = the same artifacts executing on the chip)
    name = (
        "EXPORT_SERVING.json"
        if out["backend"] == "cpu"
        else "EXPORT_SERVING_TPU.json"
    )
    Path(__file__).parent.parent.joinpath(name).write_text(
        json.dumps(out, indent=1)
    )


def _timed(fn):
    import numpy as np

    t0 = time.perf_counter()
    out = fn()
    leaf = out[0] if isinstance(out, tuple) else out
    _ = float(np.asarray(leaf).ravel()[0])
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
