"""On-chip correctness matrix for every public Pallas kernel entry.

The CPU test suite runs the kernels in interpret mode, which exercises the
math but NOT the Mosaic compile path: operand layout constraints, block
tiling, and DMA lowering only bind on real hardware.  (Round-3 example: the
misaligned-R flat-1D fast path compiled fine in interpret mode but Mosaic
rejected sub-1024-element operands — XLA lays f32[127] out with a T(128)
tile while 1-D kernel blocks assume the native T(8*128).)  This script is
the regression net for that class of failure: it sweeps shape/dtype/weight
corners of all ten public ``moments_pallas.__all__`` entries (incl. the
custom-VJP wrappers and their backward passes) on the chip and gates each
against the host-f64 two-pass reference.

Tolerances are the f32-stream delta-method bounds used by the interpret
tests (ACCURACY_1e8.json gates the large-R behavior separately); bf16
corners only gate compile + coarse agreement.

Every gate runs inside an exception trap, so a compile failure in one
entry records a failed gate and the sweep continues — CHIP_VALIDATE.json
is always written.  Exits non-zero on any failure.  Runtime is dominated
by remote kernel compiles (~2-3 min total; sizes are kept small so no
unrolled giant-block kernels are built).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _ref_co(u, x, order, w=None):
    from thermoextrap_tpu.ops.moments import reduce_central_comoments

    return reduce_central_comoments(
        np.float64(u), np.float64(x), order, weight=None if w is None else np.float64(w)
    )


def _close(got, ref, rtol, atol):
    return all(
        np.allclose(np.asarray(a, np.float64), np.asarray(b), rtol=rtol, atol=atol)
        for a, b in zip(got, ref)
    )


def main() -> None:
    from thermoextrap_tpu.ops import moments_pallas as mp
    from thermoextrap_tpu.ops.moments import reduce_central_comoments
    from thermoextrap_tpu.ops.resample import (
        freq_from_indices,
        random_indices,
        resample_central_comoments,
    )

    order = 6
    rng = np.random.default_rng(11)
    results: dict[str, bool] = {}

    def gate(name: str, check) -> None:
        """``check``: zero-arg callable returning bool.  Exceptions (Mosaic
        compile failures are the point of this script) record a failed gate
        and the sweep continues — the artifact is always written."""
        try:
            ok = bool(check())
        except Exception as e:
            print(f"  EXC[{name}]: {str(e).splitlines()[0][:110]}")
            ok = False
        results[name] = ok
        print(json.dumps({name: ok}))

    # ---- fused reduce: alignment x dtype x weight x v ---------------------
    # 127: sub-tile (pad-copy fallback); 12_832: flat-1D fast path;
    # 131_072: bitcast path; v=3: transposed-pack path.
    for r in (127, 12_832, 131_072):
        for dt in ("f32", "bf16"):
            for weighted in (False, True):
                u = rng.normal(5.0, 1.0, r).astype(np.float32)
                x = rng.normal(2.0, 0.5, (r, 1)).astype(np.float32)
                w = rng.uniform(0.5, 1.5, r).astype(np.float32) if weighted else None
                ref = _ref_co(u, x, order, w)
                uj, xj = jnp.asarray(u), jnp.asarray(x)
                if dt == "bf16":
                    uj, xj = uj.astype(jnp.bfloat16), xj.astype(jnp.bfloat16)
                    rtol, atol = 5e-2, 5e-2
                else:
                    rtol, atol = 5e-3, 1e-4
                gate(
                    f"reduce_fused r={r} {dt} w={weighted}",
                    lambda uj=uj, xj=xj, w=w, ref=ref, rtol=rtol, atol=atol: _close(
                        mp.reduce_central_comoments_fused(
                            uj, xj, order, weight=None if w is None else jnp.asarray(w)
                        ),
                        ref,
                        rtol,
                        atol,
                    ),
                )
    # multi-observable path
    r = 12_833
    u = rng.normal(5.0, 1.0, r).astype(np.float32)
    x3 = rng.normal(2.0, 0.5, (r, 3)).astype(np.float32)
    gate(
        "reduce_fused v=3 misaligned",
        lambda: _close(
            mp.reduce_central_comoments_fused(jnp.asarray(u), jnp.asarray(x3), order),
            _ref_co(u, x3, order),
            5e-3,
            1e-4,
        ),
    )

    # ---- freq-matmul resample: misaligned R, fractional freq --------------
    r, nrep = 12_832, 64
    u = rng.normal(5.0, 1.0, r).astype(np.float32)
    x = rng.normal(2.0, 0.5, (r, 1)).astype(np.float32)
    idx = random_indices(jax.random.key(3), nrep, r)
    freq = freq_from_indices(idx, r)

    def check_resample():
        ref = resample_central_comoments(
            np.float64(u), np.float64(x), np.asarray(freq, np.float64), order
        )
        got = mp.resample_central_comoments_fused(
            jnp.asarray(u), jnp.asarray(x), freq, order
        )
        return _close(got, ref, 5e-3, 1e-3)

    gate("resample_fused misaligned", check_resample)

    def check_resample_frac():
        frac = jnp.asarray(np.float32(np.asarray(freq)) * 0.5)
        ref = resample_central_comoments(
            np.float64(u), np.float64(x), np.asarray(frac, np.float64), order
        )
        got = mp.resample_central_comoments_fused(
            jnp.asarray(u), jnp.asarray(x), frac, order
        )
        return _close(got, ref, 5e-3, 1e-3)

    gate("resample_fused fractional freq", check_resample_frac)

    # ---- Poisson bootstrap: misaligned R, statistical gate only -----------
    def check_poisson():
        got_p = mp.resample_central_comoments_poisson(
            jnp.asarray(u), jnp.asarray(x), 256, order, seed=5
        )
        xave_rep = np.asarray(got_p[0], np.float64)[:, 0]
        sem = np.asarray(x[:, 0], np.float64).std() / np.sqrt(r)
        return (
            abs(xave_rep.mean() - x[:, 0].mean()) < 6 * sem / np.sqrt(256)
            and abs(xave_rep.std() / sem - 1.0) < 0.20
        )

    gate("poisson misaligned (centering + SEM 20%)", check_poisson)

    # ---- batched (macrostate-grid) kernels: non-multiple-of-8 batch -------
    B, rb_n = 5, 4_096 + 40
    ub = rng.normal(3.0, 0.8, (B, rb_n)).astype(np.float32)
    xb = (0.5 * ub + rng.normal(0, 0.2, (B, rb_n))).astype(np.float32)[..., None]

    def check_co_batched():
        ref_rows = [_ref_co(ub[b], xb[b], order) for b in range(B)]
        got_b = mp.reduce_central_comoments_batched(
            jnp.asarray(ub), jnp.asarray(xb), order
        )
        ok = True
        for b in range(B):
            row = (got_b[0][b], got_b[1][b], got_b[2][:, b], got_b[3][:, b])
            ok &= _close(row, ref_rows[b], 5e-3, 1e-4)
        return ok

    gate("reduce_co_batched B=5 misaligned", check_co_batched)

    def check_u_batched():
        got_u = mp.reduce_central_umoments_batched(jnp.asarray(ub), order)
        ok = True
        for b in range(B):
            rr = reduce_central_comoments(
                np.float64(ub[b]), np.float64(ub[b][:, None]), order
            )
            ok &= np.allclose(
                np.asarray(got_u[0][b], np.float64), rr[1], rtol=5e-3, atol=1e-4
            )
            ok &= np.allclose(
                np.asarray(got_u[1][:, b], np.float64), rr[2], rtol=5e-3, atol=1e-4
            )
        return ok

    gate("reduce_u_batched B=5 misaligned", check_u_batched)

    def check_poisson_u_batched():
        got_up = mp.resample_central_umoments_batched_poisson(
            jnp.asarray(ub), 256, order, seed=9
        )
        uave_rep = np.asarray(got_up[0], np.float64)  # (nrep, B)
        sems = np.float64(ub).std(axis=-1) / np.sqrt(rb_n)
        return bool(
            np.all(np.abs(uave_rep.mean(0) - ub.mean(-1)) < 6 * sems / np.sqrt(256))
            and np.all(np.abs(uave_rep.std(0) / sems - 1.0) < 0.25)
        )

    gate("poisson_u_batched (per-row SEM 25%)", check_poisson_u_batched)

    # ---- custom-VJP wrappers: primal match + backward pass on chip --------
    # (the _ad entries re-enter the same Pallas primals, so a layout
    # regression inside a VJP residual path only binds here)
    r = 8_192 + 24
    u = rng.normal(5.0, 1.0, r).astype(np.float32)
    x = rng.normal(2.0, 0.5, (r, 1)).astype(np.float32)
    w = np.ones(r, np.float32)

    gate(
        "fused_ad primal match",
        lambda: _close(
            mp.reduce_central_comoments_fused_ad(
                jnp.asarray(u), jnp.asarray(x), jnp.asarray(w), order
            ),
            mp.reduce_central_comoments_fused(jnp.asarray(u), jnp.asarray(x), order),
            1e-5,
            1e-6,
        ),
    )
    gate(
        "fused_ad grad finite",
        lambda: bool(
            np.isfinite(
                np.asarray(
                    jax.grad(
                        lambda uu: mp.reduce_central_comoments_fused_ad(
                            uu, jnp.asarray(x), jnp.asarray(w), order
                        )[0].sum()
                    )(jnp.asarray(u))
                )
            ).all()
        ),
    )

    wb = np.ones((B, rb_n), np.float32)

    gate(
        "co_batched_ad primal match",
        lambda: _close(
            mp.reduce_central_comoments_batched_ad(
                jnp.asarray(ub), jnp.asarray(xb), jnp.asarray(wb), order
            ),
            mp.reduce_central_comoments_batched(jnp.asarray(ub), jnp.asarray(xb), order),
            1e-5,
            1e-6,
        ),
    )
    gate(
        "co_batched_ad grad finite",
        lambda: bool(
            np.isfinite(
                np.asarray(
                    jax.grad(
                        lambda uu: mp.reduce_central_comoments_batched_ad(
                            uu, jnp.asarray(xb), jnp.asarray(wb), order
                        )[0].sum()
                    )(jnp.asarray(ub))
                )
            ).all()
        ),
    )
    gate(
        "u_batched_ad primal match",
        lambda: _close(
            mp.reduce_central_umoments_batched_ad(jnp.asarray(ub), jnp.asarray(wb), order),
            mp.reduce_central_umoments_batched(jnp.asarray(ub), order),
            1e-5,
            1e-6,
        ),
    )
    gate(
        "u_batched_ad grad finite",
        lambda: bool(
            np.isfinite(
                np.asarray(
                    jax.grad(
                        lambda uu: mp.reduce_central_umoments_batched_ad(
                            uu, jnp.asarray(wb), order
                        )[0].sum()
                    )(jnp.asarray(ub))
                )
            ).all()
        ),
    )

    def check_resample_ad():
        got = mp.resample_central_comoments_fused_ad(
            jnp.asarray(u), jnp.asarray(x), freq_from_indices(
                random_indices(jax.random.key(4), 32, r), r
            ), order
        )
        prim_freq = freq_from_indices(random_indices(jax.random.key(4), 32, r), r)
        prim = mp.resample_central_comoments_fused(
            jnp.asarray(u), jnp.asarray(x), prim_freq, order
        )
        return _close(got, prim, 1e-5, 1e-6)

    gate("resample_ad primal match", check_resample_ad)

    def check_resample_ad_grad():
        fr = freq_from_indices(random_indices(jax.random.key(4), 32, r), r)
        g = jax.grad(
            lambda uu: mp.resample_central_comoments_fused_ad(
                uu, jnp.asarray(x), fr, order
            )[0].sum()
        )(jnp.asarray(u))
        return bool(np.isfinite(np.asarray(g)).all())

    gate("resample_ad grad finite", check_resample_ad_grad)

    out = {
        "metric": "chip_kernel_validation_matrix",
        "backend": jax.default_backend(),
        "gates": results,
        "ok": all(results.values()),
    }
    Path(__file__).parent.parent.joinpath("CHIP_VALIDATE.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps({"ok": out["ok"], "n_gates": len(results)}))
    if not out["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
