"""Prototype bench: freq-matmul bootstrap kernel v2 (span-fused dots with a
NATIVE-layout 2-D freq table).

The production `resample_central_comoments_fused` runs far below its traffic
roof (~17 Grep-samples/s apparent vs the ~215 G implied by reading the
(nrep, R) int32 table at the measured 861 GB/s read roof).  PRNG_ROOF.json
showed the per-subrow K=128 dot is the limiter on the Poisson kernel; the
span fusion that fixed it there was measured SLOWER here because the freq
tile had to be span-concatenated from strided VMEM slices of a 3-D
(rep_block, subrows, lanes) block.

v2 removes that relayout entirely:

- freq stays a 2-D ``(nrep, R)`` array with ``(rep_block, subrows*lanes)``
  blocks — the per-dot freq tile is a CONTIGUOUS lane slice
  ``f_ref[:, seg*1024:(seg+1)*1024]`` (tile-aligned, no gather);
- the SAMPLE packing is pre-permuted instead (an 8x8 subrow transpose per
  64-subrow chunk), so the in-kernel span-concat over samples uses the
  stride-8 equal-sublane-offset slices already proven cheap in the Poisson
  kernel.  Permuting the samples costs one XLA copy of the R-length
  streams — 1/nrep of the freq traffic, the right side of the trade.

Variants measured (apparent + K-chained device rate where useful):
  prod          current production kernel
  v2_rb128      v2, rep_block=128
  v2_rb256      v2, rep_block=256
  v2_rb128_i8   v2 with an int8 freq table (4x less table traffic)

Writes BENCH_FREQ_V2.json.
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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from thermoextrap_tpu.ops.moments_pallas import (
    _head_shift,
    _pad_flat,
    _resample_epilogue,
    resample_central_comoments_fused,
)
from thermoextrap_tpu.ops.resample import freq_from_indices, random_indices

_LANES = 128
_SPAN = 8


def _permute_pack(a, n_chunks, subrows, lanes):
    """(R,) -> (n_chunks*subrows, lanes) with the 8x8 subrow transpose per
    chunk: permuted row 8*b + q (within a chunk) holds natural subrow
    8*q + b, so segment seg's samples sit at rows seg, seg+8, ... (equal
    sublane offsets -> cheap lane-concat in the kernel)."""
    a = _pad_flat(a, n_chunks * subrows * lanes)
    a = a.reshape(n_chunks, subrows // _SPAN, _SPAN, lanes)
    return a.swapaxes(1, 2).reshape(n_chunks * subrows, lanes)


def _v2_kernel(
    su_ref,
    sx_ref,
    f_ref,
    u_ref,
    x_ref,
    out_u_ref,
    out_xu_ref,
    *,
    order,
    n_real,
    v,
    lanes,
    subrows,
    precision=jax.lax.Precision.HIGHEST,
    precompute=False,
    transposed=False,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_u_ref[:] = jnp.zeros_like(out_u_ref)
        out_xu_ref[:] = jnp.zeros_like(out_xu_ref)

    nseg = subrows // _SPAN
    s_len = _SPAN * lanes
    rep_block = out_u_ref.shape[0]
    chunk = subrows * lanes
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, s_len), 1)

    def span_cat(ref2d, seg):
        return jnp.concatenate(
            [ref2d[seg + nseg * t : seg + nseg * t + 1, :] for t in range(_SPAN)],
            axis=1,
        )

    def body(masked: bool):
        m_rows = (1 + v) * (order + 1)
        acc = (
            jnp.zeros((m_rows, rep_block), jnp.float32)
            if transposed
            else jnp.zeros((rep_block, m_rows), jnp.float32)
        )
        if precompute:
            # build every contribution row once per chunk on full
            # (subrows, lanes) tiles (full VPU occupancy), then only the
            # lane-concat copies run per segment
            du_full = u_ref[:].astype(jnp.float32) - su_ref[0, 0]
            if masked:
                # permuted row 8*b + q holds natural subrow 8*q + b
                rid = jax.lax.broadcasted_iota(jnp.int32, (subrows, lanes), 0)
                lid = jax.lax.broadcasted_iota(jnp.int32, (subrows, lanes), 1)
                nat = (rid % nseg) * _SPAN + rid // nseg
                fmask = j * chunk + nat * lanes + lid < n_real
                zero = jnp.zeros_like(du_full)
                du_full = jnp.where(fmask, du_full, zero)
                p0_full = fmask.astype(jnp.float32)
            else:
                p0_full = jnp.ones_like(du_full)
            rows_full = [p0_full]
            for _ in range(order):
                rows_full.append(rows_full[-1] * du_full)
            for k in range(v):
                xt = x_ref[k].astype(jnp.float32) - sx_ref[0, k]
                if masked:
                    xt = jnp.where(fmask, xt, zero)
                rows_full.extend(p * xt for p in rows_full[: order + 1])
        for seg in range(nseg):
            f = f_ref[:, seg * s_len : (seg + 1) * s_len].astype(jnp.float32)
            if masked:
                mask = j * chunk + seg * s_len + pos < n_real
                f = jnp.where(mask, f, jnp.zeros_like(f))
            if precompute:
                contrib = jnp.concatenate(
                    [span_cat(row, seg) for row in rows_full], axis=0
                )
            else:
                du = span_cat(u_ref, seg).astype(jnp.float32) - su_ref[0, 0]
                if masked:
                    zero = jnp.zeros_like(du)
                    du = jnp.where(mask, du, zero)
                    p0 = mask.astype(jnp.float32)
                else:
                    p0 = jnp.ones_like(du)
                prows = [p0]
                for _ in range(order):
                    prows.append(prows[-1] * du)
                crows = []
                for k in range(v):
                    xt = span_cat(x_ref[k], seg).astype(jnp.float32) - sx_ref[0, k]
                    if masked:
                        xt = jnp.where(mask, xt, zero)
                    crows.extend(p * xt for p in prows)
                contrib = jnp.concatenate(prows + crows, axis=0)  # (m, s_len)
            if transposed:
                # output lanes = reps (all 128 used); only m_rows rows
                # stream through the MXU instead of rep_block
                acc += jax.lax.dot_general(
                    contrib,
                    f,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
            else:
                acc += jax.lax.dot_general(
                    f,
                    contrib,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )
        if transposed:
            acc = acc.T
        out_u_ref[:] += acc[:, : order + 1]
        out_xu_ref[:] += acc[:, order + 1 :]

    last = pl.num_programs(1) - 1
    if n_real % (subrows * lanes) != 0:

        @pl.when(j < last)
        def _():
            body(False)

        @pl.when(j == last)
        def _():
            body(True)

    else:
        body(False)


@functools.partial(
    jax.jit,
    static_argnames=(
        "order", "rep_block", "subrows", "precision", "precompute", "transposed",
    ),
)
def resample_v2(
    uv,
    xv,
    freq,
    order: int,
    *,
    rep_block: int = 128,
    subrows: int = 64,
    precision=jax.lax.Precision.HIGHEST,
    precompute: bool = False,
    transposed: bool = False,
):
    uv = jnp.asarray(uv)
    xv = jnp.asarray(xv)
    val_shape = xv.shape[1:]
    xv = xv.reshape(uv.shape[0], -1)
    r, v = xv.shape
    nrep = freq.shape[0]

    s_u, s_x = _head_shift(uv, None, xv)

    lanes = _LANES
    chunk = subrows * lanes
    grid_j = (r + chunk - 1) // chunk
    grid_i = (nrep + rep_block - 1) // rep_block
    pp = grid_i * rep_block

    u_p = _permute_pack(uv, grid_j, subrows, lanes)
    if v == 1:
        x_p = _permute_pack(xv[:, 0], grid_j, subrows, lanes)[None]
    else:
        xpad = jnp.pad(xv, ((0, grid_j * chunk - r), (0, 0))).T
        x_p = (
            xpad.reshape(v, grid_j, subrows // _SPAN, _SPAN, lanes)
            .swapaxes(2, 3)
            .reshape(v, grid_j * subrows, lanes)
        )

    freq = jnp.asarray(freq)
    if not jnp.issubdtype(freq.dtype, jnp.floating) and freq.dtype not in (
        jnp.int32,
        jnp.int8,
        jnp.int16,
    ):
        freq = freq.astype(jnp.int32)

    out_u, out_xu = pl.pallas_call(
        functools.partial(
            _v2_kernel,
            order=order,
            n_real=r,
            v=v,
            lanes=lanes,
            subrows=subrows,
            precision=precision,
            precompute=precompute,
            transposed=transposed,
        ),
        grid=(grid_i, grid_j),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, v), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((rep_block, chunk), lambda i, j: (i, j)),
            pl.BlockSpec((subrows, lanes), lambda i, j: (j, 0)),
            pl.BlockSpec((v, subrows, lanes), lambda i, j: (0, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rep_block, order + 1), lambda i, j: (i, 0)),
            pl.BlockSpec((rep_block, (order + 1) * v), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pp, order + 1), jnp.float32),
            jax.ShapeDtypeStruct((pp, (order + 1) * v), jnp.float32),
        ],
    )(
        jnp.reshape(s_u, (1, 1)),
        jnp.reshape(s_x, (1, v)),
        freq,
        u_p,
        x_p,
    )
    return _resample_epilogue(
        out_u[:nrep], out_xu[:nrep], s_u, s_x, nrep, order, v, val_shape
    )


def main() -> None:
    order = 6
    Rr, nrep = 1 << 20, 256
    k1, k2 = jax.random.split(jax.random.key(0))
    uv = 5.0 + jax.random.normal(k1, (Rr,), dtype=jnp.float32)
    xv = 2.0 + 0.5 * jax.random.normal(k2, (Rr, 1), dtype=jnp.float32)
    freq = freq_from_indices(random_indices(jax.random.key(3), nrep, Rr), Rr)
    freq = jax.block_until_ready(freq)

    out = {"metric": "freq_matmul_v2_prototype", "R": Rr, "nrep": nrep}
    art = Path(__file__).parent / ".." / "BENCH_FREQ_V2.json"
    if art.exists():
        try:
            out.update(json.loads(art.read_text()))
        except Exception:
            pass

    def record(key, value):
        out[key] = value
        art.write_text(json.dumps(out) + "\n")
        print(key, value, flush=True)

    # --- correctness vs production -------------------------------------
    ref = resample_central_comoments_fused(uv, xv, freq, order)
    got = resample_v2(uv, xv, freq, order)
    errs = [
        float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30))
        for a, b in zip(ref, got)
    ]
    record("v2_max_rel_err_vs_prod", [round(e, 9) for e in errs])
    assert max(errs) < 1e-4, errs

    def check(key, fn, tol=1e-4):
        g = fn()
        e = [
            float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30))
            for a, b in zip(ref, g)
        ]
        record(key, [round(x, 9) for x in e])
        assert max(e) < tol, (key, e)

    def apparent(fn):
        o = fn()
        float(jnp.asarray(o[2]).reshape(-1)[0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = fn()
            float(jnp.asarray(o[2]).reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    def device_rate(call, table=None, k_lo=4, k_hi=20):
        @functools.partial(jax.jit, static_argnames=())
        def _chain(u, x, f, k):
            def body(_, carry):
                acc, uu, xx, ff = carry
                uu, xx, ff = jax.lax.optimization_barrier((uu, xx, ff))
                o = call(uu, xx, ff)
                return acc + o[2][2, 0], uu, xx, ff

            acc, _, _, _ = jax.lax.fori_loop(
                0, k, body, (jnp.float32(0.0), u, x, f)
            )
            return acc

        def t_of(k):
            float(_chain(uv, xv, freq_c, jnp.int32(k)))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(_chain(uv, xv, freq_c, jnp.int32(k)))
                best = min(best, time.perf_counter() - t0)
            return best

        freq_c = freq if table is None else table
        t_lo, t_hi = t_of(k_lo), t_of(k_hi)
        return (k_hi - k_lo) * nrep * Rr / max(t_hi - t_lo, 1e-9) / 1e12

    if "prod_device_treps" not in out:
        t = apparent(
            lambda: resample_central_comoments_fused(uv, xv, freq, order)
        )
        record("prod_apparent_treps", round(nrep * Rr / t / 1e12, 4))
        r = device_rate(
            lambda u, x, f: resample_central_comoments_fused(u, x, f, order)
        )
        record("prod_device_treps", round(r, 4))

    if "v2_rb128_device_treps" not in out:
        t = apparent(lambda: resample_v2(uv, xv, freq, order))
        record("v2_rb128_apparent_treps", round(nrep * Rr / t / 1e12, 4))
        r = device_rate(lambda u, x, f: resample_v2(u, x, f, order))
        record("v2_rb128_device_treps", round(r, 4))

    # narrow freq tables: bootstrap counts are ~Poisson(1); max > 127 has
    # P ~ 1e-200, max > 32767 is unrepresentable-in-practice — int8/int16
    # tables cut the dominant HBM stream 4x/2x
    f16 = jax.block_until_ready(freq.astype(jnp.int16))
    f8 = jax.block_until_ready(freq.astype(jnp.int8))

    HIGH, DEFAULT = jax.lax.Precision.HIGH, jax.lax.Precision.DEFAULT
    variants = [
        # (key, freq table, kwargs)
        ("v2_rb128_i16", f16, {}),
        ("v2_rb128_i8", f8, {}),
        ("v2_rb256_sub32", freq, {"rep_block": 256, "subrows": 32}),
        ("v2_rb256_i8", f8, {"rep_block": 256}),
        ("v2_rb128_sub128_i8", f8, {"subrows": 128}),
        # sweep 2: dot precision (HIGHEST = 6-pass f32 MXU emulation; HIGH
        # = 3-pass; DEFAULT = 1 bf16 pass) and whole-block contrib precompute
        ("v2_rb128_high", freq, {"precision": HIGH}),
        ("v2_rb128_default", freq, {"precision": DEFAULT}),
        ("v2_rb128_pre", freq, {"precompute": True}),
        ("v2_rb128_pre_high", freq, {"precompute": True, "precision": HIGH}),
        ("v2_rb256_pre_high_i8", f8, {"rep_block": 256, "precompute": True, "precision": HIGH}),
        # sweep 3: transposed dot — output lanes = reps (fills all 128 MXU
        # output lanes; streams only (1+v)(order+1) rows instead of rep_block)
        ("v2t_rb128", freq, {"transposed": True}),
        ("v2t_rb128_default", freq, {"transposed": True, "precision": DEFAULT}),
        ("v2t_rb256_i8", f8, {"transposed": True, "rep_block": 256}),
        ("v2t_rb128_pre", freq, {"transposed": True, "precompute": True}),
    ]
    if "--sweep4" in sys.argv:
        # WIDE-spread device rates for the fast candidates: the 4-vs-20
        # spread used above yields sub-20 ms deltas at >0.2 T, which the
        # tunnel's min-differencing bias inflates (CLAUDE.md methodology
        # note; v2t_rb256_i8 "1.25 T" exceeded the physical table-read
        # roof).  8-vs-64 keeps every delta above ~25 ms.
        sweep4 = [
            ("prod", freq, None),
            ("v2t_rb128", freq, {"transposed": True}),
            ("v2t_rb128_pre", freq, {"transposed": True, "precompute": True}),
            ("v2t_rb128_pre_i8", f8, {"transposed": True, "precompute": True}),
            ("v2t_rb256_i8", f8, {"transposed": True, "rep_block": 256}),
            (
                "v2t_rb256_pre_i8",
                f8,
                {"transposed": True, "rep_block": 256, "precompute": True},
            ),
            (
                "v2t_rb256_pre_i16",
                f16,
                {"transposed": True, "rep_block": 256, "precompute": True},
            ),
        ]
        for key, ftab, kws in sweep4:
            try:
                if kws is None:
                    call = lambda u, x, f: resample_central_comoments_fused(
                        u, x, f, order
                    )
                else:
                    def call(u, x, f, _kws=kws):
                        return resample_v2(u, x, f, order, **_kws)

                r = device_rate(call, table=ftab, k_lo=8, k_hi=64)
                record(f"w_{key}_device_treps", round(r, 4))
            except Exception as e:
                record(f"w_{key}_error", repr(e)[:300])
        return

    for key, ftab, kws in variants:
        if f"{key}_device_treps" in out:
            continue
        tol = 0.05 if kws.get("precision") in (HIGH, DEFAULT) else 1e-4
        try:
            check(
                f"{key}_max_rel_err",
                lambda: resample_v2(uv, xv, ftab, order, **kws),
                tol=tol,
            )
            t = apparent(lambda: resample_v2(uv, xv, ftab, order, **kws))
            record(f"{key}_apparent_treps", round(nrep * Rr / t / 1e12, 4))

            def call(u, x, f, _kws=kws):
                return resample_v2(u, x, f, order, **_kws)

            r = device_rate(call, table=ftab)
            record(f"{key}_device_treps", round(r, 4))
        except Exception as e:  # Mosaic may reject a layout/dtype on v5e
            record(f"{key}_error", repr(e)[:300])


if __name__ == "__main__":
    main()
