"""Poisson-bootstrap kernel cost decomposition (PRNG_ROOF-style, at HEAD).

The production in-kernel-Poisson bootstrap runs at 0.127 Trep-samples/s
vs the 0.202 T draw+transform recipe roof (PRNG_ROOF.json) — the ~37%
gap was attributed to the residual MXU dot without a measurement
isolating it (VERDICT r3 weak #2 / next #4).  This bench rebuilds the
decomposition with the CURRENT kernel structure (span-8 lane-concat,
TRANSPOSED ``contrib (m, K) @ freq^T (K, reps)`` dot — the session-4/5
rewrites that PRNG_ROOF's original ``draw_dot`` row predates):

- ``draw_only``      : PRNG + 11-threshold Poisson transform, same grid /
                       tile shapes, freq consumed by a row add (no dot).
- ``draw_dot_const`` : + the transposed (14, 1024) @ (1024, 128) f32 dot
                       against a CONSTANT contrib block (no sample
                       stream, no VPU contrib build) — isolates the dot.
- ``full_f32``       : the production kernel at HEAD (stream + contrib
                       build + draw + dot).
- ``full_dot_bf16``  : production kernel variant with the dot operands
                       cast to bf16 (freq counts <= 11 are EXACT in
                       bf16; contrib rounding adds ~2e-3 relative
                       quantization, same class as the gated bf16 sample
                       streams) — the MXU runs bf16 at a multiple of the
                       f32 rate, so if the dot is the gap this closes it.

Rates in Grep-samples/s (nrep * R / t).  Writes POISSON_DECOMP.json.

Usage: python benches/bench_poisson_decomp.py
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from thermoextrap_tpu.ops import moments_pallas as mp

R = 100_000_000
NREP = 256
ORDER = 6
REP_BLOCK = 128
REPEATS = 3


def _variant_kernel(
    su_ref, sx_ref, seed_ref, u_ref, x_ref, out_u_ref, out_xu_ref,
    *, order, n_real, mode
):
    """The production _poisson_resample_kernel body with the stage under
    test selected by ``mode`` (draw / draw_dot_const / full / full_bf16)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_u_ref[:] = jnp.zeros_like(out_u_ref)
        out_xu_ref[:] = jnp.zeros_like(out_xu_ref)

    pltpu.prng_seed(seed_ref[0, 0], i * nj + j)
    rep_block = out_u_ref.shape[0]
    subrows, lanes = u_ref.shape
    span, stride = mp._dot_span(subrows)
    s_len = span * lanes
    m = 2 * (order + 1)
    acc = jnp.zeros((m, rep_block), jnp.float32)
    acc_d = jnp.zeros((rep_block, 8), jnp.float32)

    for s0 in range(stride):
        if mode == "draw":
            f = mp._poisson_draw(rep_block, s_len)
            # consume without a dot: one add per segment into 8 lanes
            acc_d += f[:, :8]
            continue
        if mode == "draw_dot_const":
            contrib = jnp.full((m, s_len), 1.0 + s0 * 1e-3, jnp.float32)
        else:
            du = (
                mp._span_cat(u_ref, s0, span, stride).astype(jnp.float32)
                - su_ref[0, 0]
            )
            mask = mp._span_mask(j, subrows, s0, span, stride, lanes, n_real)
            prows = [mask]
            for _ in range(order):
                prows.append(prows[-1] * du)
            xt = (
                mp._span_cat(x_ref[0], s0, span, stride).astype(jnp.float32)
                - sx_ref[0, 0]
            )
            crows = [p * xt for p in prows]
            contrib = jnp.concatenate(prows + crows, axis=0)
        f = mp._poisson_draw(rep_block, s_len)
        if mode == "full_bf16":
            acc += jax.lax.dot_general(
                contrib.astype(jnp.bfloat16),
                f.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            acc += jax.lax.dot_general(
                contrib, f, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    if mode == "draw":
        out_u_ref[:] += acc_d[:, : order + 1]
        return
    accT = acc.T
    out_u_ref[:] += accT[:, : order + 1]
    out_xu_ref[:] += accT[:, order + 1 :]


def _run_variant(mode, u_p, x_p, s_u, s_x, r):
    lanes = mp._LANES
    subrows = mp._REC_CHUNK // lanes
    nb = u_p.shape[0]
    pp = NREP

    call = pl.pallas_call(
        functools.partial(
            _variant_kernel, order=ORDER, n_real=r, mode=mode
        ),
        grid=(pp // REP_BLOCK, nb // subrows),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((subrows, lanes), lambda i, j: (j, 0)),
            pl.BlockSpec((1, subrows, lanes), lambda i, j: (0, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((REP_BLOCK, ORDER + 1), lambda i, j: (i, 0)),
            pl.BlockSpec((REP_BLOCK, (ORDER + 1)), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pp, ORDER + 1), jnp.float32),
            jax.ShapeDtypeStruct((pp, ORDER + 1), jnp.float32),
        ],
    )

    su2 = jnp.reshape(s_u, (1, 1))
    sx2 = jnp.reshape(s_x, (1, 1))
    seed = jnp.full((1, 1), 7, jnp.int32)

    @jax.jit
    def chain(up, xp, k):
        def body(_, carry):
            acc, uu, xx = carry
            uu, xx = jax.lax.optimization_barrier((uu, xx))
            ou, _ = call(su2, sx2, seed, uu, xx)
            return acc + ou[0, 0], uu, xx

        acc, _, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), up, xp))
        return acc

    def t_of(k):
        float(chain(u_p, x_p, k))
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            float(chain(u_p, x_p, k))
            best = min(best, time.perf_counter() - t0)
        return best

    k_lo, k_hi = 2, 8
    t_lo, t_hi = t_of(k_lo), t_of(k_hi)
    if t_hi <= t_lo:
        return None
    dt = (t_hi - t_lo) / (k_hi - k_lo)
    return NREP * r / dt / 1e9  # Grep-samples/s


def main() -> None:
    on_accel = jax.default_backend() != "cpu"
    r = R if on_accel else 1_000_000

    k1, k2 = jax.random.split(jax.random.key(0))
    uv = 5.0 + jax.random.normal(k1, (r,), jnp.float32)
    xv = 2.0 + 0.5 * jax.random.normal(k2, (r,), jnp.float32)
    s_u, s_x = mp._head_shift(uv, None, xv[:, None])

    lanes = mp._LANES
    u_p = mp._pack(uv, ((r + lanes - 1) // lanes))
    # pad rows so the grid divides evenly by subrows
    subrows = mp._REC_CHUNK // lanes
    nb = u_p.shape[0]
    nbp = ((nb + subrows - 1) // subrows) * subrows
    u_p = jnp.pad(u_p, ((0, nbp - nb), (0, 0)))
    x_p = jnp.pad(mp._pack(xv, nb), ((0, nbp - nb), (0, 0)))[None]

    out = {"backend": jax.default_backend(), "R": r, "nrep": NREP}
    for mode in ("draw", "draw_dot_const", "full_f32", "full_bf16"):
        rate = _run_variant(
            "full" if mode == "full_f32" else mode, u_p, x_p, s_u, s_x, r
        )
        out[mode + "_grep_samples_per_s"] = (
            None if rate is None else round(rate, 1)
        )
        print(json.dumps({mode: out[mode + "_grep_samples_per_s"]}), flush=True)

    # accuracy of the bf16-dot variant vs f32 (same seeds -> same freqs)
    got = {}
    for mode in ("full", "full_bf16"):
        ou, oxu = _accuracy_pass(mode, u_p, x_p, s_u, s_x, r)
        got[mode] = (ou, oxu)
    import numpy as np

    rel = float(
        np.max(
            np.abs(got["full_bf16"][1] - got["full"][1])
            / (np.abs(got["full"][1]) + 1e-30)
        )
    )
    out["bf16_dot_max_rel_err_vs_f32"] = rel
    Path(__file__).parent.parent.joinpath("POISSON_DECOMP.json").write_text(
        json.dumps(out, indent=1)
    )
    print(json.dumps(out))


def _accuracy_pass(mode, u_p, x_p, s_u, s_x, r):
    import numpy as np

    lanes = mp._LANES
    subrows = mp._REC_CHUNK // lanes
    nb = u_p.shape[0]
    call = pl.pallas_call(
        functools.partial(_variant_kernel, order=ORDER, n_real=r, mode=mode),
        grid=(NREP // REP_BLOCK, nb // subrows),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((subrows, lanes), lambda i, j: (j, 0)),
            pl.BlockSpec((1, subrows, lanes), lambda i, j: (0, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((REP_BLOCK, ORDER + 1), lambda i, j: (i, 0)),
            pl.BlockSpec((REP_BLOCK, ORDER + 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NREP, ORDER + 1), jnp.float32),
            jax.ShapeDtypeStruct((NREP, ORDER + 1), jnp.float32),
        ],
    )
    ou, oxu = jax.jit(call)(
        jnp.reshape(s_u, (1, 1)),
        jnp.reshape(s_x, (1, 1)),
        jnp.full((1, 1), 7, jnp.int32),
        u_p,
        x_p,
    )
    return np.asarray(ou), np.asarray(oxu)


if __name__ == "__main__":
    main()
