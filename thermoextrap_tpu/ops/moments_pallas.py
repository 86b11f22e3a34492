r"""Fused Pallas TPU kernels for (co)moment reduction and bootstrap.

These are the TPU-native replacements for cmomy's numba hot loops
(SURVEY.md §2a; reference usage /root/reference/src/thermoextrap/data.py:
485-536, 1285-1392, 1750-1813).  Design notes:

**Layout.** On this TPU backend a 2D f32 array is tiled ``T(8,128)`` in
HBM, so an ``(R, 1)`` column is physically padded 128x.  All kernel
operands are therefore laid out dense: samples packed into rows of ``B``
lanes (``u -> (R/B, B)``) and the observable transposed to
``(V, R/B, B)``.  ``B = 128`` is the ONLY width for which the packing
reshape is a true layout-preserving **bitcast**: an ``(8,128)`` tile
covers 1024 consecutive elements exactly when each 8-row band holds one
tile, while wider rows interleave tiles across the band and force XLA to
materialize a full relayout copy of the input on every call (measured
3.3x end-to-end cost at R~1e8 — HBM_ROOF.json; this replaced the round-2
"divisors of R" packing).  ``R % 128 != 0`` falls back to a pad copy.
The grid takes a partial final block, masked with ``jnp.where`` (the
overrun region is undefined memory; multiply-masking would propagate
NaNs).

**Single-pass shifted reduction** (:func:`reduce_central_comoments_fused`):
the XLA implementation (ops/moments.py) streams the data twice (means pass +
central pass).  Here one pass accumulates *shifted* raw moments about a
cheap pre-estimated shift (mean of the first chunk), and an exact
O(order^2) binomial recentering recovers central moments.  Central moments
are shift-invariant, so the result is exact up to f32 accumulation roundoff
while halving HBM traffic.  The accumulation is written as row-group FMA
chains (see :func:`_reduce_kernel`) — ~20 single-issue VPU ops per sample
for order 6 — and partial sums accumulate in VMEM with the lane axis
reduced in a tiny XLA epilogue.

**Bootstrap** (:func:`resample_central_comoments_fused`): per-replicate
moments as a frequency matmul with the contribution rows (powers of
shifted u times x) built on the fly in VMEM — a real
``contribs (m, R) @ freq^T (R, nrep)`` MXU product without materializing
the contribution matrix in HBM.  The dot is TRANSPOSED on purpose: output
lanes = replicates fills every MXU pass, the freq table streams in its
native 2-D layout and int dtype (int8/int16/int32), and the sample
streams are pre-permuted so the in-kernel span gather is relayout-free —
see :func:`_resample_kernel` for the measured breakdown.

All kernels accumulate in float32 (bf16 inputs upcast on load — bf16
streams halve HBM traffic and are accuracy-gated at R=1e8, see
benches/bench_accuracy_1e8.py) and mask the real-data tail with a
global-index iota.  Batched variants (``reduce_central_umoments_batched``,
``reduce_central_comoments_batched``) run the same shifted single pass
over a ``(batch, rec-block)`` grid with per-batch shifts in SMEM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .convert import shift_raw_comoments, shift_raw_moments

__all__ = [
    "reduce_central_comoments_batched",
    "reduce_central_comoments_batched_ad",
    "reduce_central_comoments_fused",
    "reduce_central_comoments_fused_ad",
    "reduce_central_umoments_batched",
    "reduce_central_umoments_batched_ad",
    "resample_central_comoments_fused",
    "resample_central_comoments_fused_ad",
    "resample_central_comoments_poisson",
    "resample_central_umoments_batched_poisson",
    "resample_perturb_freq",
    "resample_perturb_poisson",
]

_LANES = 128  # lane width of the packed sample rows (layout-preserving)


def _interpret_eager_jit(*static_argnames):
    """jit the kernel entry for the device path, but run the SAME function
    eagerly when called with ``interpret=True``: on jax 0.9.0 an
    interpret-mode pallas program embedded in a larger jitted XLA:CPU
    computation miscompiles (observed while validating the span kernels:
    poison OOB-block padding leaking past where-masks, and correct eager
    results turning into misaligned replicate sums under one outer
    ``jax.jit``).  ``interpret`` must be keyword-only on the wrapped
    entry — positional calls would silently take the jitted path."""

    def deco(impl):
        jitted = functools.partial(
            jax.jit, static_argnames=static_argnames
        )(impl)

        @functools.wraps(impl)
        def wrapper(*args, **kwargs):
            if kwargs.get("interpret", False):
                return impl(*args, **kwargs)
            return jitted(*args, **kwargs)

        return wrapper

    return deco


def _pad_flat(a, n):
    """Pad a 1d array to length n with zeros."""
    return jnp.pad(a, (0, n - a.shape[0])) if a.shape[0] != n else a


def _head_shift(uv, w_flat, xv=None, head_n: int = 8192):
    """Numerical-centering shift estimate from the first chunk (cheap XLA
    slice).  The kernels recenter the shifted sums exactly afterwards, so
    ANY finite value preserves correctness — a zero-weight head (e.g.
    burn-in masked with weight=0) must fall back to shift 0 instead of
    emitting 0/0 = NaN into every output (the fallback only costs f32
    conditioning, not exactness).  Returns ``s_u`` or ``(s_u, s_x)``.
    """
    head = min(head_n, uv.shape[0])
    w_head = (
        jnp.ones((head,), jnp.float32) if w_flat is None else w_flat[:head]
    )
    ws = w_head.sum()
    ok = ws > 0
    safe = jnp.where(ok, ws, 1.0)
    s_u = jnp.where(ok, (w_head * uv[:head]).sum() / safe, 0.0)
    if xv is None:
        return s_u
    s_x = jnp.where(ok, (w_head[:, None] * xv[:head]).sum(0) / safe, 0.0)
    return s_u, s_x


def _head_shift_batched(u2, w2, x3=None, head_n: int = 8192):
    """Per-batch variant of :func:`_head_shift` for ``(nbatch, R)`` streams
    (and optional ``(nbatch, R, V)`` x streams)."""
    nbatch, r = u2.shape
    head = min(head_n, r)
    w_head = (
        jnp.ones((nbatch, head), jnp.float32) if w2 is None else w2[:, :head]
    )
    hsum = w_head.sum(-1)
    ok = hsum > 0
    safe = jnp.where(ok, hsum, 1.0)
    s_u = jnp.where(ok, (w_head * u2[:, :head]).sum(-1) / safe, 0.0)
    if x3 is None:
        return s_u
    s_x = jnp.where(
        ok[:, None],
        (w_head[:, :, None] * x3[:, :head]).sum(1) / safe[:, None],
        0.0,
    )
    return s_u, s_x


def _stream_dtype(uv, xv):
    """bf16 opt-in must be explicit for BOTH streams: keying on one would
    silently downcast (or silently ignore) the other.  Returns the common
    in-kernel stream dtype."""
    if (uv.dtype == jnp.bfloat16) != (xv.dtype == jnp.bfloat16):
        msg = (
            f"mixed input dtypes {uv.dtype}/{xv.dtype}: cast both uv and xv "
            "to bfloat16 to opt into the half-traffic stream, or neither"
        )
        raise ValueError(msg)
    return jnp.bfloat16 if uv.dtype == jnp.bfloat16 else jnp.float32


def _pack(a, rows_total):
    """(R,) -> (rows_total, LANES) dense row layout."""
    return _pad_flat(a, rows_total * _LANES).reshape(rows_total, _LANES)


# ---------------------------------------------------------------------------
# single-pass shifted (co)moment reduction
#
# NEGATIVE RESULT (round-3 session-5, measured): an MXU-dot reformulation —
# contrib rows ``[w·du^0 .. w·du^order] (order+1, K=1024) @ [ones, dx]^T``
# per span, absorbing every accumulate-FMA and dx-product into one
# dot_general — ran at ~15 Gs/s for BOTH dtypes vs 92 (f32) / 154 (bf16)
# for the VPU row-group kernel below.  The dtype-independence pins the
# cost on layout, not bandwidth or issue rate: building the (m, 1024)
# contrib matrix requires sublane-concats of strided single-row slices
# (~100 issue-equivalents/sample), which the freq-matmul bootstrap kernel
# only amortizes because each sample feeds 128-256 replicate columns of
# MXU output.  With a 2-column rhs there is nothing to amortize against.
# Don't retry without a way to materialize power rows across sublanes
# for free.
# ---------------------------------------------------------------------------


def _reduce_kernel(
    su_ref,
    sx_ref,
    u_ref,
    x_ref,
    *rest,
    order,
    use_w,
    rows,
    n_real,
    v,
    lanes,
    flat1d=False,
):
    """Inputs per grid step: u ``(rows, B)``, x ``(v, rows, B)``; partial
    sums accumulate into per-(sublane, lane) tiles ``(order+1, 8, B)`` /
    ``(v*(order+1), 8, B)`` reduced by the XLA epilogue.

    **FMA row-group formulation** (round-3 rewrite, 3.3x on-chip): the
    block streams through in groups of 8 sublane rows with per-group
    ``(8, B)`` accumulators, written so every x-comoment step is a single
    multiply-add expression (``p * x + acc``) that Mosaic lowers to one
    VPU FMA issue, and the trivial n=0 terms are free (the unweighted
    count is a compile-time constant; ``p1 = du`` needs no multiply).
    That cuts the issue count from ~29 to ~20 per sample for order 6/V=1
    — the old ``mult -> tile-reduce`` form measured at exactly the VPU
    issue rate (HBM_ROOF.json), so fewer issues is the whole speedup:
    f32 27.6 -> 92 Gs/s (~83%% of the measured 890 GB/s read roof),
    bf16 46.5 -> 115 Gs/s (then VPU-bound again at ~2.3 T issue/s).

    Inputs may be bfloat16 (upcast on load; accumulation always f32): the
    stream is HBM-bandwidth-sensitive and bf16 halves the traffic, while
    the quantization noise is statistically negligible against sampling
    noise at large R (tests/test_parallel.py bf16 accuracy gate).

    Tail masking runs only in the *final* grid step (``pl.when`` branch), so
    the bulk of the stream pays zero masking cost.  The tail uses
    ``jnp.where`` (not multiply-by-mask) because the final grid block may
    extend past the real array — Pallas pads it with *undefined* memory,
    and ``0 * garbage`` would propagate NaNs where ``where`` does not.
    """
    if use_w:
        w_ref, out_u_ref, out_xu_ref = rest
    else:
        out_u_ref, out_xu_ref = rest
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_u_ref[:] = jnp.zeros_like(out_u_ref)
        out_xu_ref[:] = jnp.zeros_like(out_xu_ref)

    su = su_ref[0, 0]
    sx = [sx_ref[0, k] for k in range(v)]
    if flat1d:
        # misaligned-R path: streams arrive as flat (rows*lanes,) blocks of
        # the ORIGINAL array (no host-side pad copy); the in-register
        # reshape costs a relayout (~70% of the bitcast stream rate on-chip
        # vs ~40% for the padded copy it replaces).  v == 1 only.
        u = u_ref[:].astype(jnp.float32).reshape(rows, lanes)
        xs = [x_ref[:].astype(jnp.float32).reshape(rows, lanes)]
        w = (
            w_ref[:].astype(jnp.float32).reshape(rows, lanes)
            if use_w
            else None
        )
    else:
        u = u_ref[:].astype(jnp.float32)
        xs = [x_ref[k].astype(jnp.float32) for k in range(v)]
        w = w_ref[:].astype(jnp.float32) if use_w else None
    g_count = rows // 8

    def body(masked: bool):
        acc_w = jnp.zeros((8, lanes), jnp.float32)
        acc_u = [jnp.zeros((8, lanes), jnp.float32) for _ in range(order)]
        acc_x = [
            jnp.zeros((8, lanes), jnp.float32) for _ in range(v * (order + 1))
        ]
        for g in range(g_count):
            sl = slice(g * 8, (g + 1) * 8)
            du = u[sl] - su
            xt = [xs[k][sl] - sx[k] for k in range(v)]
            if masked:
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 0)
                lane_ids = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 1)
                flat = (i * rows + g * 8 + row_ids) * lanes + lane_ids
                mask = flat < n_real
                zero = jnp.zeros_like(du)
                du = jnp.where(mask, du, zero)
                xt = [jnp.where(mask, xk, zero) for xk in xt]
                wg = (
                    jnp.where(mask, w[sl], zero)
                    if use_w
                    else mask.astype(jnp.float32)
                )
            else:
                wg = w[sl] if use_w else None

            if wg is None:
                # unweighted full block: count is static, p1 = du is free
                p = du
            else:
                acc_w = acc_w + wg
                p = wg * du
            for k in range(v):
                acc_x[k * (order + 1)] = (
                    (xt[k] + acc_x[k * (order + 1)])
                    if wg is None
                    else (wg * xt[k] + acc_x[k * (order + 1)])
                )
            for n in range(1, order + 1):
                acc_u[n - 1] = acc_u[n - 1] + p
                for k in range(v):
                    # single-issue VPU FMA
                    acc_x[k * (order + 1) + n] = (
                        p * xt[k] + acc_x[k * (order + 1) + n]
                    )
                if n < order:
                    p = p * du
        if use_w or masked:
            out_u_ref[0, :, :] += acc_w
        else:
            out_u_ref[0, :, :] += jnp.full(
                (8, lanes), float(g_count), jnp.float32
            )
        for n in range(1, order + 1):
            out_u_ref[n, :, :] += acc_u[n - 1]
        for j in range(v * (order + 1)):
            out_xu_ref[j, :, :] += acc_x[j]

    last = pl.num_programs(0) - 1
    has_tail = n_real % (rows * lanes) != 0

    if has_tail:

        @pl.when(i < last)
        def _():
            body(False)

        @pl.when(i == last)
        def _():
            body(True)

    else:
        body(False)


@_interpret_eager_jit("order", "block", "interpret")
def reduce_central_comoments_fused(
    uv,
    xv,
    order: int,
    weight=None,
    *,
    block: int = 131072,
    interpret: bool = False,
):
    r"""Fused single-pass central comoment reduction for the flat hot path.

    ``uv``: ``(R,)``; ``xv``: ``(R, *val)``; returns ``(xave, uave, du, dxdu)``
    with the contract of :func:`ops.moments.reduce_central_comoments`
    (``batch=()``).  ``block`` = samples per grid step; packing is always
    at the layout-preserving 128-lane width, so the f32 V=1 default works
    out to 1024 rows x 128 lanes per stream (measured fastest on-chip —
    smaller blocks pipeline the DMA better than VMEM-limit-sized ones,
    and bf16 doubles the rows).

    bfloat16 inputs stream at half the HBM traffic (compute stays f32
    in-kernel); pass bf16 arrays to opt in.
    """
    uv = jnp.asarray(uv)
    xv = jnp.asarray(xv)
    in_dtype = _stream_dtype(uv, xv)
    uv = uv.astype(in_dtype)
    val_shape = xv.shape[1:]
    xv = xv.astype(in_dtype).reshape(uv.shape[0], -1)
    r, v = xv.shape

    w_flat = (
        None
        if weight is None
        else jnp.broadcast_to(jnp.asarray(weight, jnp.float32), (r,))
    )

    # shift estimate from the first chunk (cheap XLA slice)
    s_u, s_x = _head_shift(uv, w_flat, xv)

    sub = 16 if in_dtype == jnp.bfloat16 else 8  # min sublane tile
    # 128 lanes is the ONLY row width for which (R,) -> (rows, lanes) is a
    # true layout-preserving bitcast: an (8,128) HBM tile spans 1024
    # CONSECUTIVE elements exactly when each 8-row band holds one tile.
    # Wider rows (the round-2 1024/512/256 "divisor" packing) interleave
    # tiles across the band, so XLA materializes a full relayout copy of
    # both input streams on every call — measured 3.3x slower end to end
    # (HBM_ROOF.json; 27 -> 92 Gs/s f32 at R~1e8 from this one change).
    lanes = 128
    # ``block`` = per-stream f32-equivalent elements per grid step; bf16
    # streams double it (half the bytes).  Scale rows down as the stream
    # count grows so the double-buffered VMEM footprint stays constant.
    streams = 1 + v + (1 if weight is not None else 0)
    base = block * (2 if in_dtype == jnp.bfloat16 else 1)
    rows = max(2 * base // (lanes * streams), sub) // sub * sub
    if interpret:
        # interpret mode EXECUTES the rows//8-way unrolled row-group loop
        # as a traced jax program — a device-sized block (2048 rows = 256
        # groups) takes minutes on CPU.  Block sizing is a device-perf
        # concern only; keep correctness runs small.
        rows = min(rows, 4 * sub)
    # clamp the block for small inputs so padding stays bounded
    rows_needed = ((r + lanes - 1) // lanes + sub - 1) // sub * sub
    rows = min(rows, rows_needed)
    rows_total = (r + lanes - 1) // lanes
    grid = (rows_total + rows - 1) // rows  # partial last block allowed
    # interpret mode: zero-pad every operand to FULL block coverage — the
    # hlo interpreter fills out-of-bounds block regions with poison and
    # XLA:CPU can leak it past where-masks when several operands carry OOB
    # blocks (see resample_central_comoments_fused).  Device path keeps
    # the minimal zero-copy packing (partial last block is fine on TPU).
    rows_pad = grid * rows if interpret else rows_total
    blk = rows * lanes
    # misaligned R: (R,) -> (rows, lanes) is NOT a bitcast, and both
    # jnp.pad and prefix slices materialize a full copy of every stream
    # before the kernel (measured 2.1x end-to-end at R=12.5e6+32).  Stream
    # flat 1-D blocks of the ORIGINAL array instead and reshape in-register
    # inside the kernel (~70% of the bitcast rate vs ~45% for the copy).
    # v == 1 only: the v > 1 x-path pays a transposed copy regardless.
    # r >= one full HBM tile (sub*lanes = 1024 f32 / 2048 bf16) is required:
    # below that XLA lays the 1-D array out with a SMALLER tile (e.g.
    # {0:T(128)} for f32[127]) and Mosaic rejects the operand (its 1-D
    # blocks assume the native T(8*128) tiling); the pad copy is free at
    # those sizes anyway.
    flat1d = (r % lanes != 0) and v == 1 and r >= sub * lanes

    if flat1d:
        # interpret mode still needs full block coverage (poison defense)
        n_flat = grid * blk if interpret else r
        u_p = _pad_flat(uv, n_flat)
        x_p = _pad_flat(xv[:, 0], n_flat)
        u_spec = pl.BlockSpec((blk,), lambda i: (i,))
        x_spec = pl.BlockSpec((blk,), lambda i: (i,))
        w_spec = pl.BlockSpec((blk,), lambda i: (i,))
    else:

        def pack1(a):
            if r == rows_pad * lanes:
                return a.reshape(rows_pad, lanes)  # bitcast, zero copy
            return _pad_flat(a, rows_pad * lanes).reshape(rows_pad, lanes)

        u_p = pack1(uv)
        if v == 1:
            x_p = pack1(xv[:, 0])[None]  # free reshape, no transpose
        else:
            # one transposed copy for all observable columns (vs a pass per
            # column)
            x_p = jnp.pad(xv, ((0, rows_pad * lanes - r), (0, 0))).T.reshape(
                v, rows_pad, lanes
            )
        u_spec = pl.BlockSpec((rows, lanes), lambda i: (i, 0))
        x_spec = pl.BlockSpec((v, rows, lanes), lambda i: (0, i, 0))
        w_spec = pl.BlockSpec((rows, lanes), lambda i: (i, 0))

    operands = [
        jnp.reshape(s_u, (1, 1)),
        jnp.reshape(s_x, (1, v)),
        u_p,
        x_p,
    ]
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, v), lambda i: (0, 0), memory_space=pltpu.SMEM),
        u_spec,
        x_spec,
    ]
    use_w = w_flat is not None
    if use_w:
        operands.append(
            _pad_flat(w_flat, n_flat) if flat1d else pack1(w_flat)
        )
        in_specs.append(w_spec)

    out_u, out_xu = pl.pallas_call(
        functools.partial(
            _reduce_kernel,
            order=order,
            use_w=use_w,
            rows=rows,
            n_real=r,
            v=v,
            lanes=lanes,
            flat1d=flat1d,
        ),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((order + 1, 8, lanes), lambda i: (0, 0, 0)),
            pl.BlockSpec((v * (order + 1), 8, lanes), lambda i: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((order + 1, 8, lanes), jnp.float32),
            jax.ShapeDtypeStruct((v * (order + 1), 8, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    sum_u = out_u.sum(axis=(1, 2))  # (order+1,)
    sum_xu = out_xu.sum(axis=(1, 2)).reshape(v, order + 1).T  # (order+1, v)
    return _postprocess_shifted(sum_u, sum_xu, s_u, s_x, val_shape)


def _postprocess_shifted(sum_u, sum_xu, s_u, s_x, val_shape):
    """Shifted raw sums -> exact central comoments (tiny XLA epilogue)."""
    wsum = sum_u[0]
    m = sum_u / wsum  # shifted raw u-moments; m[0] = 1
    c = sum_xu / wsum  # shifted raw comoments of shifted x

    uave = m[1] + s_u
    xave = c[0] + s_x

    du = shift_raw_moments(m, m[1])
    x_du = shift_raw_comoments(c, m[1])
    dxdu = x_du - c[0][None, :] * du[:, None]
    du = du.at[0].set(1.0).at[1].set(0.0)
    dxdu = dxdu.at[0].set(0.0)
    order = sum_u.shape[0] - 1
    return (
        xave.reshape(val_shape),
        uave,
        du,
        dxdu.reshape((order + 1, *val_shape)),
    )


# ---------------------------------------------------------------------------
# bootstrap: freq @ on-the-fly contributions
# ---------------------------------------------------------------------------


_REC_CHUNK = 8192  # samples per resample grid step (subrows * lanes)
_FREQ_SPAN = 8  # sample subrows lane-concatenated per freq-matmul MXU dot


def _freq_permute_pack(a, n_chunks, subrows, lanes):
    """(R,) -> (n_chunks*subrows, lanes) with an 8x8 subrow transpose per
    chunk: permuted row ``8*b + q`` (chunk-relative, ``q = s // 8``,
    ``b = s % 8``) holds natural subrow ``s = 8*q + b``.  Segment ``seg``'s
    samples (natural subrows ``8*seg .. 8*seg+7``) then sit at permuted rows
    ``seg, seg+nseg, seg+2*nseg, ...`` — stride-``nseg`` slices with EQUAL
    sublane offsets, the cheap lane-concat Mosaic accepts (see
    :func:`_dot_span`) — while the freq table keeps its NATIVE 2-D layout.
    One XLA copy of the R-length sample streams, 1/nrep of the freq-table
    traffic it avoids relayouting."""
    a = _pad_flat(a, n_chunks * subrows * lanes)
    a = a.reshape(n_chunks, subrows // _FREQ_SPAN, _FREQ_SPAN, lanes)
    return a.swapaxes(1, 2).reshape(n_chunks * subrows, lanes)


def _resample_kernel(
    su_ref,
    sx_ref,
    f_ref,
    u_ref,
    x_ref,
    *rest,
    order,
    use_w,
    n_real,
    v,
    lanes,
    subrows,
):
    """Round-3 rewrite (3.8x, benches/bench_freq_v2.py sweep; the kernel now
    reads the frequency table at ~88%% of the measured HBM read roof):

    - **Native-layout 2-D freq blocks** ``(rep_block, subrows*lanes)``: the
      per-dot freq tile is a CONTIGUOUS lane slice (tile-aligned, no
      relayout).  Freq streams in its native dtype — int8/int16/int32
      tables all pass through untouched (casting the (nrep, R) table
      host-side would materialize a copy costing more HBM traffic than the
      kernel itself; narrow int tables cut the dominant stream 4x/2x and
      measured +27%%); conversion to f32 happens per block in VMEM.  The
      SAMPLE packing is pre-permuted instead (:func:`_freq_permute_pack`),
      so its span-concat uses stride-``nseg`` equal-offset slices — the
      original span-fusion attempt concatenated the FREQ tile from strided
      3-D block slices, and those relayout copies made it slower than no
      fusion at all.
    - **Span-fused K**: each ``dot_general`` contracts
      ``_FREQ_SPAN * lanes = 1024`` samples (2.5x over per-subrow K=128
      dots).
    - **Transposed dot orientation**: ``contrib (m, K) @ freq^T (K, reps)``
      — output lanes = replicates, so every MXU pass fills all 128 output
      lanes and only ``m = (1+v)(order+1)`` rows stream through, instead
      of streaming ``rep_block`` rows for a 14-wide output (~89%% of every
      pass wasted).  This orientation alone measured +56%% on top of the
      span fusion.  (Relaxing ``Precision.HIGHEST`` was measured SLOWER
      and 2e-3 inaccurate; ``HIGH`` is unsupported by Mosaic.)

    Sample streams may be bfloat16 (upcast on load — half HBM traffic,
    accuracy-gated like the fused reduce).  Tail blocks use ``jnp.where``
    masks on every operand that may alias undefined memory."""
    if use_w:
        w_ref, out_u_ref, out_xu_ref = rest
    else:
        out_u_ref, out_xu_ref = rest
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_u_ref[:] = jnp.zeros_like(out_u_ref)
        out_xu_ref[:] = jnp.zeros_like(out_xu_ref)

    nseg = subrows // _FREQ_SPAN
    s_len = _FREQ_SPAN * lanes
    chunk = subrows * lanes
    rep_block = out_u_ref.shape[0]
    m_rows = (1 + v) * (order + 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, s_len), 1)

    def seg_cat(ref2d, seg):
        # permuted-row gather: segment seg = rows seg, seg+nseg, ... (equal
        # sublane offsets; lane position t*lanes+l = natural sample
        # seg*s_len + t*lanes + l, matching the freq lane slice below)
        return jnp.concatenate(
            [
                ref2d[seg + nseg * t : seg + nseg * t + 1, :]
                for t in range(_FREQ_SPAN)
            ],
            axis=1,
        )

    def body(masked: bool):
        acc = jnp.zeros((m_rows, rep_block), jnp.float32)
        for seg in range(nseg):
            du = seg_cat(u_ref, seg).astype(jnp.float32) - su_ref[0, 0]
            f = f_ref[:, seg * s_len : (seg + 1) * s_len].astype(jnp.float32)
            p0 = (
                seg_cat(w_ref, seg).astype(jnp.float32)
                if use_w
                else jnp.ones_like(du)
            )
            if masked:
                mask = j * chunk + seg * s_len + pos < n_real
                zero = jnp.zeros_like(du)
                du = jnp.where(mask, du, zero)
                p0 = jnp.where(mask, p0, zero)
                f = jnp.where(mask, f, jnp.zeros_like(f))

            prows = [p0]
            for _ in range(order):
                prows.append(prows[-1] * du)

            crows = []
            for k in range(v):
                xt = seg_cat(x_ref[k], seg).astype(jnp.float32) - sx_ref[0, k]
                if masked:
                    xt = jnp.where(mask, xt, zero)
                crows.extend(p * xt for p in prows)
            contrib = jnp.concatenate(prows + crows, axis=0)  # (m, s_len)
            acc += jax.lax.dot_general(
                contrib,
                f,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        accT = acc.T  # (rep_block, m) — once per chunk
        out_u_ref[:] += accT[:, : order + 1]
        out_xu_ref[:] += accT[:, order + 1 :]

    last = pl.num_programs(1) - 1
    has_tail = n_real % (subrows * lanes) != 0
    if has_tail:

        @pl.when(j < last)
        def _():
            body(False)

        @pl.when(j == last)
        def _():
            body(True)

    else:
        body(False)


@_interpret_eager_jit("order", "rep_block", "interpret")
def resample_central_comoments_fused(
    uv,
    xv,
    freq,
    order: int,
    weight=None,
    *,
    rep_block: int = 128,
    interpret: bool = False,
):
    r"""Per-replicate central comoments via the fused freq-matmul kernel.

    Same contract as :func:`ops.resample.resample_central_comoments`:
    returns ``(xave (nrep, *val), uave (nrep,), du (order+1, nrep),
    dxdu (order+1, nrep, *val))``.  bfloat16 sample streams (both ``uv``
    and ``xv``) halve their HBM traffic; the freq table streams in its
    native int dtype either way.
    """
    uv = jnp.asarray(uv)
    xv = jnp.asarray(xv)
    in_dtype = _stream_dtype(uv, xv)
    uv = uv.astype(in_dtype)
    val_shape = xv.shape[1:]
    xv = xv.astype(in_dtype).reshape(uv.shape[0], -1)
    r, v = xv.shape
    nrep = freq.shape[0]

    w_flat = (
        None
        if weight is None
        else jnp.broadcast_to(jnp.asarray(weight, jnp.float32), (r,))
    )

    s_u, s_x = _head_shift(uv, w_flat, xv)

    # the (nrep, R) freq table — the dominant HBM stream — keeps its NATIVE
    # 2-D layout and dtype (no reshape, no cast, no relayout); the sample
    # streams are pre-permuted instead so the kernel's span gather is cheap
    # (_freq_permute_pack — one XLA copy of the R-length streams, 1/nrep of
    # the table traffic).  Partial final grid blocks in both the rep and
    # the rec dimension are handled by output slicing / where-masked tails.
    lanes = _LANES
    subrows = _REC_CHUNK // lanes
    if interpret:
        # see reduce_central_comoments_fused: interpret mode executes the
        # unrolled segment loop as a traced jax program — keep blocks small
        subrows = min(subrows, 16)
    chunk = subrows * lanes
    grid_i = (nrep + rep_block - 1) // rep_block
    grid_j = (r + chunk - 1) // chunk
    pp = grid_i * rep_block

    u_p = _freq_permute_pack(uv, grid_j, subrows, lanes)
    if v == 1:
        x_p = _freq_permute_pack(xv[:, 0], grid_j, subrows, lanes)[None]
    else:
        xpad = jnp.pad(xv, ((0, grid_j * chunk - r), (0, 0))).T
        x_p = (
            xpad.reshape(v, grid_j, subrows // _FREQ_SPAN, _FREQ_SPAN, lanes)
            .swapaxes(2, 3)
            .reshape(v, grid_j * subrows, lanes)
        )
    freq = jnp.asarray(freq)
    # integer tables stream natively — int8/int16/int32 all pass through
    # (narrow tables cut the dominant stream 4x/2x; see
    # ops.resample.freq_from_indices(dtype=...)) — and convert in VMEM;
    # FLOAT tables (fractional weights, e.g. Bayesian-bootstrap
    # Dirichlet * R) must stay floating — truncating them to int would
    # silently corrupt the replicate moments
    if jnp.issubdtype(freq.dtype, jnp.floating):
        if freq.dtype not in (jnp.float32, jnp.bfloat16):
            freq = freq.astype(jnp.float32)
    elif freq.dtype not in (jnp.int8, jnp.int16, jnp.int32):
        freq = freq.astype(jnp.int32)  # e.g. x64-mode int64 tables

    if interpret:
        # jax's hlo interpreter fills out-of-bounds block regions with
        # poison values (NaN for floats, INT_MIN for ints) — and on jax
        # 0.9.0's CPU backend a miscompilation can leak that poison past
        # the kernel's where-masks when several operands carry OOB blocks
        # (observed: rep- or rec-padded freq + any second operand).  Pad
        # every operand to full block coverage with zeros instead: the
        # n_real mask already excludes the padded region, and a leaked
        # zero contributes nothing.  Device (Mosaic) runs are unaffected.
        # (The permuted sample packs already cover every block.)
        freq = jnp.pad(freq, ((0, pp - nrep), (0, grid_j * chunk - r)))
    operands = [
        jnp.reshape(s_u, (1, 1)),
        jnp.reshape(s_x, (1, v)),
        freq,
        u_p,
        x_p,
    ]
    in_specs = [
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, v), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((rep_block, chunk), lambda i, j: (i, j)),
        pl.BlockSpec((subrows, lanes), lambda i, j: (j, 0)),
        pl.BlockSpec((v, subrows, lanes), lambda i, j: (0, j, 0)),
    ]
    use_w = w_flat is not None
    if use_w:
        operands.append(_freq_permute_pack(w_flat, grid_j, subrows, lanes))
        in_specs.append(pl.BlockSpec((subrows, lanes), lambda i, j: (j, 0)))

    out_u, out_xu = pl.pallas_call(
        functools.partial(
            _resample_kernel,
            order=order,
            use_w=use_w,
            n_real=r,
            v=v,
            lanes=lanes,
            subrows=subrows,
        ),
        grid=(grid_i, grid_j),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((rep_block, order + 1), lambda i, j: (i, 0)),
            pl.BlockSpec((rep_block, (order + 1) * v), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pp, order + 1), jnp.float32),
            jax.ShapeDtypeStruct((pp, (order + 1) * v), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    return _resample_epilogue(
        out_u[:nrep], out_xu[:nrep], s_u, s_x, nrep, order, v, val_shape
    )


def _resample_epilogue(
    sum_u, sum_xu, s_u, s_x, nrep, order, v, val_shape, return_wsum=False
):
    """Per-replicate shifted raw sums -> exact central comoments."""
    # contribution rows are v-major: row k*(order+1)+n
    sum_xu = jnp.moveaxis(
        sum_xu.reshape(nrep, v, order + 1), 2, 1
    )  # (nrep, order+1, v)

    wsum = sum_u[:, 0:1]
    m = jnp.moveaxis(sum_u / wsum, 1, 0)  # (order+1, nrep)
    c = jnp.moveaxis(sum_xu / wsum[:, :, None], 1, 0)  # (order+1, nrep, V)

    uave = m[1] + s_u
    xave = (c[0] + s_x).reshape((nrep, *val_shape))

    du = shift_raw_moments(m, m[1])
    x_du = shift_raw_comoments(c, m[1][:, None])
    dxdu = x_du - c[0][None] * du[:, :, None]
    du = du.at[0].set(1.0).at[1].set(0.0)
    dxdu = dxdu.at[0].set(0.0).reshape((order + 1, nrep, *val_shape))
    if return_wsum:
        # per-replicate total resampled weight (n=0 raw power sum) — the
        # pooling weight a streaming accumulator needs to merge this
        # chunk's replicates exactly (pipeline.make_streaming_extrap_
        # pipeline(nrep=)).  A zero row (possible with Poisson freqs)
        # emits NaN stats above; the moment merge masks zero-weight
        # members (ops/convert.merge_central_comoments).
        return xave, uave, du, dxdu, wsum[:, 0]
    return xave, uave, du, dxdu


# ---------------------------------------------------------------------------
# Poisson bootstrap with in-kernel frequency generation
# ---------------------------------------------------------------------------

# Poisson(1) inverse-CDF thresholds as uint32 cutoffs: freq = #{k : u32 > t_k}.
# Truncated at 9 (P ~ 1e-7); mean stays 1 to ~1e-7.
# canonical truncated Poisson(1) CDF lives in ops.resample (shared with
# the XLA-path poisson1_freq so the truncation contract is identical)
from .resample import POISSON1_CDF as _POISSON1_CDF  # noqa: E402


_POISSON_SPAN = 8  # subrows concatenated per MXU dot (K = span * lanes; 16/K=2048 measured identical)


def _dot_span(subrows: int) -> tuple[int, int]:
    """``(span, stride)`` for lane-concatenating ``span`` subrows per MXU
    dot: pieces ``s0 + stride*t`` for ``t < span``, ``s0 < stride``, which
    partitions ``[0, subrows)`` exactly for any 8-divisible ``subrows``.
    Lane-concat requires equal sublane offsets on every piece (Mosaic:
    "offset mismatch on non-concat dimension"); ``stride = subrows//span``
    is a multiple of 8 because ``span`` divides ``subrows // 8``, so every
    piece sits at sublane ``s0 % 8`` of its tile.  (At the production
    ``subrows=64`` this is span 8 / stride 8 — the layout the chip gates
    in POISSON_CHIP.json were generated with.)"""
    if subrows % 8 != 0:
        return 1, subrows
    span = max(math.gcd(_POISSON_SPAN, subrows // 8), 1)
    return span, subrows // span


def _span_cat(ref2d, s0, span, stride):
    """Strided span gather (see :func:`_dot_span`): concatenate ``span``
    stride-separated subrows along lanes so one MXU dot contracts
    ``span * lanes`` samples."""
    return jnp.concatenate(
        [
            ref2d[s0 + stride * t : s0 + stride * t + 1, :]
            for t in range(span)
        ],
        axis=1,
    )


def _span_mask(j, subrows, s0, span, stride, lanes, n_real):
    """Validity mask for a span-concatenated segment (same stride
    arithmetic as :func:`_span_cat`), as f32 for the weight product."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    return jnp.concatenate(
        [
            ((j * subrows + s0 + stride * t) * lanes + lane < n_real)
            for t in range(span)
        ],
        axis=1,
    ).astype(jnp.float32)


def _poisson_draw(rep_block, s_len):
    """One ``(rep_block, s_len)`` Poisson(1) frequency tile from the
    in-kernel PRNG via the u32 CDF threshold sum.  The draw size and
    threshold order are part of the seed contract — BOTH Poisson kernels
    share this helper so their streams stay bit-identical per (i, j)."""
    bits = pltpu.bitcast(
        pltpu.prng_random_bits((rep_block, s_len)), jnp.uint32
    )
    f = jnp.zeros((rep_block, s_len), jnp.float32)
    for cdf in _POISSON1_CDF:
        f = f + (bits > jnp.uint32(int(cdf * 4294967296.0))).astype(
            jnp.float32
        )
    return f


def _poisson_resample_kernel(
    su_ref, sx_ref, seed_ref, u_ref, x_ref, *rest, order, use_w, n_real, v
):
    """Like :func:`_resample_kernel` but the frequency tile is generated
    on-chip from the Pallas PRNG — zero HBM traffic for the bootstrap table
    (Poisson(1) weights; asymptotically equivalent to multinomial
    resampling).

    MXU issue economy (PRNG_ROOF.json showed the per-subrow K=128 dot —
    not PRNG generation — capped the old kernel at ~60 Grep-samples/s):
    ``_POISSON_SPAN`` consecutive subrows are concatenated along lanes so
    each ``dot_general`` contracts K = span·lanes samples, and the
    u-moment and x-comoment contribution rows ride ONE fused dot instead
    of two — 2·span fewer MXU issues per sample.  The draw order changes
    (one ``(rep_block, span·lanes)`` tile per span instead of span
    ``(rep_block, lanes)`` tiles), which relabels (rep, sample)→u32
    assignments within a block: statistically identical iid streams,
    different concrete frequencies for the same seed than pre-span
    kernels.

    The dot runs TRANSPOSED — ``contrib (m, K) @ freq^T (K, reps)`` — so
    every MXU pass fills all 128 output lanes (replicates) and only
    ``m = (1+v)(order+1)`` rows stream through, instead of streaming
    ``rep_block`` rows for an m-wide output with ~89%% of every pass
    wasted (same rewrite as :func:`_resample_kernel`, measured there at
    +56%%; the frequency VALUES are unchanged — only the accumulation
    association differs, at f32 roundoff)."""
    if use_w:
        w_ref, out_u_ref, out_xu_ref = rest
    else:
        out_u_ref, out_xu_ref = rest
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_u_ref[:] = jnp.zeros_like(out_u_ref)
        out_xu_ref[:] = jnp.zeros_like(out_xu_ref)

    # unique per-(rep-block, rec-block) stream; the block id goes in a
    # SECOND seed word so that adjacent user seeds do not alias adjacent
    # blocks (seed s, block k+1 vs seed s+1, block k)
    pltpu.prng_seed(seed_ref[0, 0], i * nj + j)

    rep_block = out_u_ref.shape[0]
    subrows, lanes = u_ref.shape
    # strided span gather (see _dot_span); sample indices per concatenated
    # segment follow the same stride in the mask arithmetic
    span, stride = _dot_span(subrows)
    s_len = span * lanes
    acc = jnp.zeros(((1 + v) * (order + 1), rep_block), jnp.float32)

    for s0 in range(stride):
        du = _span_cat(u_ref, s0, span, stride).astype(jnp.float32) - su_ref[0, 0]
        mask = _span_mask(j, subrows, s0, span, stride, lanes, n_real)
        p0 = _span_cat(w_ref, s0, span, stride) * mask if use_w else mask

        prows = [p0]
        for _ in range(order):
            prows.append(prows[-1] * du)
        crows = []
        for k in range(v):
            xt = (
                _span_cat(x_ref[k], s0, span, stride).astype(jnp.float32)
                - sx_ref[0, k]
            )
            crows.extend(p * xt for p in prows)
        contrib = jnp.concatenate(prows + crows, axis=0)  # (m, S)

        f = _poisson_draw(rep_block, s_len)

        acc += jax.lax.dot_general(
            contrib, f, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    accT = acc.T  # (rep_block, m) — once per chunk
    out_u_ref[:] += accT[:, : order + 1]
    out_xu_ref[:] += accT[:, order + 1 :]


@_interpret_eager_jit("nrep", "order", "rep_block", "return_wsum", "interpret")
def resample_central_comoments_poisson(
    uv,
    xv,
    nrep: int,
    order: int,
    weight=None,
    *,
    seed: int = 0,
    rep_block: int = 128,
    return_wsum: bool = False,
    interpret: bool = False,
):
    r"""Poisson bootstrap entirely on-chip: per-replicate central comoments
    with the frequency table generated from the Pallas PRNG inside the
    kernel.  Scales to huge ``R`` (the ``(nrep, R)`` table never exists).

    Same return contract as :func:`resample_central_comoments_fused`;
    ``return_wsum=True`` appends the per-replicate total resampled weight
    ``wsum (nrep,)`` (the in-kernel frequencies never exist in HBM, so the
    streaming accumulator cannot recover it otherwise).  ``seed`` may be a
    traced int32 scalar (streaming pipelines derive one per chunk).
    bfloat16 sample streams (both ``uv`` and ``xv``) halve HBM traffic —
    and this kernel's only HBM traffic IS the sample stream.
    """
    uv = jnp.asarray(uv)
    xv = jnp.asarray(xv)
    in_dtype = _stream_dtype(uv, xv)
    uv = uv.astype(in_dtype)
    val_shape = xv.shape[1:]
    xv = xv.astype(in_dtype).reshape(uv.shape[0], -1)
    r, v = xv.shape

    w_flat = (
        None
        if weight is None
        else jnp.broadcast_to(jnp.asarray(weight, jnp.float32), (r,))
    )

    s_u, s_x = _head_shift(uv, w_flat, xv)

    lanes = _LANES
    subrows = _REC_CHUNK // lanes
    chunk = subrows * lanes
    rp = ((r + chunk - 1) // chunk) * chunk
    nb = rp // lanes
    pp = ((nrep + rep_block - 1) // rep_block) * rep_block

    u_p = _pack(uv, nb)
    if v == 1:
        x_p = _pack(xv[:, 0], nb)[None]
    else:
        x_p = jnp.pad(xv, ((0, nb * lanes - r), (0, 0))).T.reshape(v, nb, lanes)

    operands = [
        jnp.reshape(s_u, (1, 1)),
        jnp.reshape(s_x, (1, v)),
        jnp.full((1, 1), seed, dtype=jnp.int32),
        u_p,
        x_p,
    ]
    in_specs = [
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, v), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((subrows, lanes), lambda i, j: (j, 0)),
        pl.BlockSpec((v, subrows, lanes), lambda i, j: (0, j, 0)),
    ]
    use_w = w_flat is not None
    if use_w:
        operands.append(_pack(w_flat, nb))
        in_specs.append(pl.BlockSpec((subrows, lanes), lambda i, j: (j, 0)))

    out_u, out_xu = pl.pallas_call(
        functools.partial(
            _poisson_resample_kernel, order=order, use_w=use_w, n_real=r, v=v
        ),
        grid=(pp // rep_block, nb // subrows),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((rep_block, order + 1), lambda i, j: (i, 0)),
            pl.BlockSpec((rep_block, (order + 1) * v), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pp, order + 1), jnp.float32),
            jax.ShapeDtypeStruct((pp, (order + 1) * v), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    return _resample_epilogue(
        out_u[:nrep], out_xu[:nrep], s_u, s_x, nrep, order, v, val_shape,
        return_wsum=return_wsum,
    )


def _poisson_resample_u_batched_kernel(
    su_ref, seed_ref, u_ref, *rest, order, use_w, n_real, gb
):
    """Batched-grid Poisson bootstrap of u-moments.  Grid ``(bg, i, j)``
    = (batch GROUP of ``gb`` rows, rep block, rec block).  The PRNG seed
    EXCLUDES the batch id, so every batch row sees the IDENTICAL
    frequency tile: a bootstrap replicate resamples whole
    configurations, which are joint across the macrostate grid
    (reference lnpi resampling along ``rec``, lnpi.py:258-286).

    **Row-group MXU packing (round 4, +gb× utilization)**: because the
    frequency tile is shared, ``gb`` batch rows' contribution rows stack
    into ONE transposed dot — ``(gb·(order+1), K) @ (K, reps)`` — so the
    MXU runs at ``gb·(order+1)/128`` row utilization instead of
    ``(order+1)/128``, and the Poisson tile is drawn once per GROUP
    instead of once per row (the per-row kernel redrew the identical
    tile ``nbatch`` times).  The draw schedule per ``(i, j)`` step is
    unchanged, so replicate frequencies are identical to the per-row
    kernel for any ``gb`` (results differ only by f32 dot association).
    """
    if use_w:
        w_ref, out_ref = rest
    else:
        (out_ref,) = rest
    i = pl.program_id(1)
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    pltpu.prng_seed(seed_ref[0, 0], i * nj + j)  # batch-independent stream

    bg = pl.program_id(0)
    rep_block = out_ref.shape[1]
    subrows, lanes = u_ref.shape[1], u_ref.shape[2]
    # strided span-concatenated K, exactly as in _poisson_resample_kernel
    span, stride = _dot_span(subrows)
    s_len = span * lanes
    n1 = order + 1
    acc = jnp.zeros((gb * n1, rep_block), jnp.float32)

    for s0 in range(stride):
        mask = _span_mask(j, subrows, s0, span, stride, lanes, n_real)
        rows = []
        for k in range(gb):
            du = (
                _span_cat(u_ref[k], s0, span, stride).astype(jnp.float32)
                - su_ref[bg * gb + k, 0]
            )
            p0 = (
                _span_cat(w_ref[k], s0, span, stride) * mask
                if use_w
                else mask
            )
            prows = [p0]
            for _ in range(order):
                prows.append(prows[-1] * du)
            rows.extend(prows)
        p = jnp.concatenate(rows, axis=0)  # (gb*(order+1), S)

        f = _poisson_draw(rep_block, s_len)

        acc += jax.lax.dot_general(
            p, f, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    for k in range(gb):
        out_ref[k] += acc[k * n1 : (k + 1) * n1].T


def _batch_group_size(nbatch: int, order: int, group_rows: int | None = None):
    """Group-size arithmetic for the batch-grouped grid Poisson kernel:
    returns ``(gb, nbp)`` — rows per MXU group and the padded batch count.

    ``gb`` stacks ``gb*(order+1)`` contribution rows into one transposed
    dot, capped so they fit the 128 MXU rows.  Prefer the largest DIVISOR
    of ``nbatch`` under the cap (the group reshape is then zero-copy); a
    batch with no usable divisor (e.g. prime ``nbatch > cap``) takes the
    cap and pads to ``nbp``, the next multiple of ``gb``.  Pure arithmetic
    — unit-tested without a chip (ADVICE r4).
    """
    cap = max(1, min(nbatch, 128 // (order + 1)))
    if group_rows is not None:
        gb = max(1, int(group_rows))
    else:
        gb = max(d for d in range(1, cap + 1) if nbatch % d == 0)
        if gb < max(2, cap // 2) and nbatch > cap:
            gb = cap  # poor divisor (e.g. prime nbatch): pad instead
    nbp = ((nbatch + gb - 1) // gb) * gb
    return gb, nbp


def _pad_pack_batch(a, rp: int, nbp: int, lanes: int):
    """Pad ``(nbatch, r)`` to ``(nbp, rp)`` — rec pad zeros, batch pad rows
    replicate row 0 (cheap, numerically tame; the caller slices them off) —
    then reshape to the kernel's ``(nbp, rp//lanes, lanes)`` block layout
    (a zero-copy bitcast when no padding engages)."""
    nbatch, r = a.shape
    if r != rp:
        a = jnp.pad(a, ((0, 0), (0, rp - r)))
    if nbp != nbatch:
        a = jnp.concatenate([a, jnp.broadcast_to(a[:1], (nbp - nbatch, rp))])
    return a.reshape(nbp, rp // lanes, lanes)


@_interpret_eager_jit(
    "nrep", "order", "rep_block", "return_wsum", "interpret", "group_rows"
)
def resample_central_umoments_batched_poisson(
    uv,
    nrep: int,
    order: int,
    weight=None,
    *,
    seed: int = 0,
    rep_block: int = 128,
    return_wsum: bool = False,
    interpret: bool = False,
    group_rows: int | None = None,
):
    r"""On-chip Poisson bootstrap of BATCHED central u-moments (the lnΠ
    macrostate-grid uncertainty path): frequencies generated in-kernel
    from the Pallas PRNG, shared across all batch rows, zero HBM traffic
    for the ``(nrep, R)`` table.

    ``uv (*batch, R)`` → ``(uave (nrep, *batch), du (order+1, nrep,
    *batch))``, matching :func:`ops.resample.resample_central_umoments_batched`.
    ``return_wsum=True`` appends the per-replicate resampled weight
    ``wsum (nrep, *batch)`` (the raw n=0 power sum — the pooling weight a
    streaming accumulator needs; the in-kernel frequencies never exist in
    HBM, so it cannot be recovered otherwise).  ``seed`` may be a traced
    int32 scalar (streaming pipelines derive one per chunk).
    """
    uv = jnp.asarray(uv)
    if uv.dtype != jnp.bfloat16:
        uv = uv.astype(jnp.float32)  # bf16 opt-in streams at half traffic
    batch_shape = uv.shape[:-1]
    r = uv.shape[-1]
    u2 = uv.reshape(-1, r)
    nbatch = u2.shape[0]

    w2 = (
        None
        if weight is None
        else jnp.broadcast_to(jnp.asarray(weight, jnp.float32), uv.shape).reshape(
            -1, r
        )
    )

    s_u = _head_shift_batched(u2, w2)  # (nbatch,)

    lanes = _LANES
    subrows = _REC_CHUNK // lanes
    chunk = subrows * lanes
    rp = ((r + chunk - 1) // chunk) * chunk
    nb = rp // lanes
    pp = ((nrep + rep_block - 1) // rep_block) * rep_block

    # batch-group size: stack gb rows' (order+1) contrib rows into one
    # MXU dot (see kernel docstring) — as many as fill the 128 MXU rows.
    # A non-divisor gb needs batch padding, and the pad concatenate
    # materializes a copy of the WHOLE operand (measured OOM at B=512 x
    # 1e6 f32 when the pad path engaged), so _batch_group_size reserves
    # padding for batch counts with no usable divisor.  group_rows=
    # overrides (tests exercise the multi-group + pad paths at small
    # nbatch; results are gb-invariant up to f32 association).
    gb, nbp = _batch_group_size(nbatch, order, group_rows)

    def packb(a):
        return _pad_pack_batch(a, rp, nbp, lanes)

    s_up = (
        s_u
        if nbp == nbatch
        else jnp.concatenate([s_u, jnp.broadcast_to(s_u[:1], (nbp - nbatch,))])
    )
    operands = [
        s_up.reshape(nbp, 1).astype(jnp.float32),
        jnp.full((1, 1), seed, dtype=jnp.int32),
        packb(u2),
    ]
    in_specs = [
        # whole shift table in SMEM (a (gb, 1) block can violate the
        # last-two-dims tiling rule); the kernel indexes b*gb + k
        pl.BlockSpec(
            (nbp, 1), lambda b, i, j: (0, 0), memory_space=pltpu.SMEM
        ),
        pl.BlockSpec((1, 1), lambda b, i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((gb, subrows, lanes), lambda b, i, j: (b, j, 0)),
    ]
    use_w = w2 is not None
    if use_w:
        operands.append(packb(w2))
        in_specs.append(
            pl.BlockSpec((gb, subrows, lanes), lambda b, i, j: (b, j, 0))
        )

    (out,) = pl.pallas_call(
        functools.partial(
            _poisson_resample_u_batched_kernel,
            order=order,
            use_w=use_w,
            n_real=r,
            gb=gb,
        ),
        grid=(nbp // gb, pp // rep_block, nb // subrows),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((gb, rep_block, order + 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbp, pp, order + 1), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    sums = jnp.moveaxis(out[:nbatch, :nrep], 2, 0)  # (order+1, nbatch, nrep)
    m = sums / sums[0]
    uave_r = (m[1] + s_u[:, None]).T  # (nrep, nbatch)
    du_r = shift_raw_moments(m, m[1])  # (order+1, nbatch, nrep)
    du_r = jnp.swapaxes(du_r, 1, 2).at[0].set(1.0).at[1].set(0.0)
    ret = (
        uave_r.reshape((nrep, *batch_shape)),
        du_r.reshape((order + 1, nrep, *batch_shape)),
    )
    if return_wsum:
        # a zero replicate row (possible with Poisson freqs) emits NaN
        # stats above; the streaming merge masks zero-weight members
        return (*ret, sums[0].T.reshape((nrep, *batch_shape)))
    return ret


# ---------------------------------------------------------------------------
# batched u-moment reduction (lnPi-style workloads: energy moments per
# macrostate; x_is_u so only u-moments are needed)
# ---------------------------------------------------------------------------


def _perturb_rows(esegs, xsegs, na):
    """Perturbation contribution rows for one sample segment: per target
    ``a`` the stabilized reweight factors ``e_a`` times ``[x_1..x_V, 1]``
    — ``na*(V+1)`` rows stacked so ONE transposed MXU dot against the
    shared frequency tile serves every target (the batch-grouped
    grid-kernel trick, VERDICT r4: targets share the tile exactly as grid
    rows do).

    ``e`` is STREAMED, not rebuilt in-kernel: the round-5 decomposition
    measured the in-VMEM ``exp`` contrib build at 4.4x the moment
    kernel's per-dot cost (Mosaic transcendentals on (1, s_len) rows),
    while streaming the XLA-computed ``pipeline._perturb_weights`` rows
    costs only A x 4 B/sample of extra HBM traffic AND makes the kernel
    share the predict path's exact weight values (weights, shifts and the
    zero-weight mask all fold into ``e`` on the XLA side; the rec pad is
    zero in ``e``, so padded lanes contribute exactly nothing with no
    in-kernel masks)."""
    rows = []
    for a in range(na):
        rows.extend(esegs[a] * xt for xt in xsegs)
        rows.append(esegs[a])
    return jnp.concatenate(rows, axis=0)  # (na*(V+1), S)


def _perturb_poisson_kernel(
    seed_ref, e_ref, x_ref, out_ref, *, na, v, out_group
):
    """Perturbation bootstrap with the frequency tile generated on-chip
    (zero HBM table traffic).  Seed contract, span gather, and transposed
    dot orientation are IDENTICAL to :func:`_poisson_resample_kernel`
    (``prng_seed(seed, i*nj + j)`` + :func:`_poisson_draw` per span), so at
    equal ``(seed, R, nrep, rep_block)`` this kernel consumes the exact
    frequency stream of the flat moment kernel — the dalpha=0 equality
    gate in benches/bench_perturb_focus.py rides on that."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    pltpu.prng_seed(seed_ref[0, 0], i * nj + j)

    rep_block = out_ref.shape[1]
    subrows, lanes = x_ref.shape[1:]
    span, stride = _dot_span(subrows)
    s_len = span * lanes
    m = na * (1 + v)
    acc = jnp.zeros((m, rep_block), jnp.float32)

    for s0 in range(stride):
        esegs = [_span_cat(e_ref[a], s0, span, stride) for a in range(na)]
        xsegs = [_span_cat(x_ref[k], s0, span, stride) for k in range(v)]
        contrib = _perturb_rows(esegs, xsegs, na)
        f = _poisson_draw(rep_block, s_len)
        acc += jax.lax.dot_general(
            contrib, f, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    # grouped partials: accumulate out_group consecutive rec blocks into
    # one resident output block (index j//out_group — Pallas keeps the
    # revisited block in VMEM), then the XLA epilogue tree-sums the
    # partials.  Serial accumulation across ALL ~1e4 rec blocks measured
    # 3e-4 f32 roundoff at R=1e7 (the einsum path's own error level);
    # grouping bounds it at out_group*eps while keeping output traffic
    # 1/out_group of the per-block-partials version.
    @pl.when(j % out_group == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[0] += acc.T  # (1, rep_block, m)


def _perturb_freq_kernel(
    f_ref, e_ref, x_ref, out_ref, *, na, v, n_real, lanes, subrows, out_group
):
    """Perturbation bootstrap against a MATERIALIZED frequency table in its
    native 2-D layout/dtype (int8 tables stream at 1/4 the f32 traffic and
    convert per block in VMEM — same layout findings as
    :func:`_resample_kernel`).  Draw-count parity: the table is the very
    ``poisson1_freq`` array the XLA path and the AOT artifacts consume, so
    replicate counts are IDENTICAL across kernel/XLA/export at equal seed.
    Only the tail frequency block needs masking (undefined OOB floats can
    be NaN; the e/x packs are zero-padded to full coverage)."""
    j = pl.program_id(1)

    nseg = subrows // _FREQ_SPAN
    s_len = _FREQ_SPAN * lanes
    chunk = subrows * lanes
    m = na * (1 + v)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, s_len), 1)

    def seg_cat(ref2d, seg):
        return jnp.concatenate(
            [
                ref2d[seg + nseg * t : seg + nseg * t + 1, :]
                for t in range(_FREQ_SPAN)
            ],
            axis=1,
        )

    @pl.when(j % out_group == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(masked: bool):
        rep_block = out_ref.shape[1]
        acc = jnp.zeros((m, rep_block), jnp.float32)
        for seg in range(nseg):
            f = f_ref[:, seg * s_len : (seg + 1) * s_len].astype(jnp.float32)
            if masked:
                # where, not multiply: undefined OOB floats can be NaN
                # and NaN * 0 = NaN (same fix as _resample_kernel)
                f = jnp.where(
                    j * chunk + seg * s_len + pos < n_real,
                    f,
                    jnp.zeros_like(f),
                )
            esegs = [seg_cat(e_ref[a], seg) for a in range(na)]
            xsegs = [seg_cat(x_ref[k], seg) for k in range(v)]
            contrib = _perturb_rows(esegs, xsegs, na)
            acc += jax.lax.dot_general(
                contrib, f, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        out_ref[0] += acc.T

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


def _perturb_prep(ev, xv):
    ev = jnp.asarray(ev, jnp.float32)
    xv = jnp.asarray(xv, jnp.float32)
    na, r = ev.shape
    xv = xv.reshape(r, -1)
    v = xv.shape[1]
    if na * (1 + v) > 512:
        msg = (
            f"perturb kernel: targets*(V+1) = {na * (1 + v)} contribution "
            "rows exceed the 512-row block budget; chunk the targets or "
            "use the XLA path"
        )
        raise ValueError(msg)
    return ev, xv, na, v, r


def _perturb_epilogue(out, nrep, na, v):
    """(npartials, pp, na*(v+1)) grouped partials -> (na, nrep, v+1)
    sums matching the XLA einsum layout (pipeline._perturb_boot): per
    target the first ``v`` columns are the weighted-x numerators, the
    last the weight sum.  The cross-partial reduction runs as an XLA tree
    sum; measured kernel-vs-host-f64 agreement 7e-7 at R=1e7 where the
    XLA einsum's K-serial f32 contraction carries 3e-4
    (PERTURB_DECOMP.json gates)."""
    return out.sum(axis=0)[:nrep].reshape(nrep, na, 1 + v).swapaxes(0, 1)


@_interpret_eager_jit("nrep", "rep_block", "out_group", "interpret")
def resample_perturb_poisson(
    ev,
    xv,
    nrep: int,
    *,
    seed: int = 0,
    rep_block: int = 128,
    out_group: int = 64,
    interpret: bool = False,
):
    r"""On-chip Poisson bootstrap of perturbation-reweighted sums: the
    ``(nrep, R)`` table never exists, the frequency tile is drawn in-kernel
    and SHARED by every target (reference PerturbModel CI role,
    models.py:1019-1039; VERDICT r4 item 1).

    ``ev (A, R)``: the max-shift-stabilized weights from
    ``pipeline._perturb_weights`` (weights/shifts/zero-masks pre-folded);
    ``xv (R, V)`` → sums ``(A, nrep, V+1)``: per target the
    Poisson-weighted ``sum_r f_r e_a(u_r) [x_r | 1]``; divide numerators
    by the last column for replicate predictions (0/0 NaN convention
    preserved).  ``seed`` may be a traced int32 scalar.  Draw schedule ==
    the flat moment kernel's (:func:`_poisson_draw` per (rep, rec)
    block), so frequencies match
    :func:`resample_central_comoments_poisson` at equal seed — NOT the
    ``poisson1_freq`` table stream (use :func:`resample_perturb_freq`
    when count-parity with the XLA/AOT paths matters).
    """
    ev, xv, na, v, r = _perturb_prep(ev, xv)

    lanes = _LANES
    subrows = _REC_CHUNK // lanes
    chunk = subrows * lanes
    rp = ((r + chunk - 1) // chunk) * chunk
    nb = rp // lanes
    pp = ((nrep + rep_block - 1) // rep_block) * rep_block
    m = na * (1 + v)
    grid_j = nb // subrows
    npart = (grid_j + out_group - 1) // out_group

    def packrows(a2d, nrows):
        if r != rp:
            a2d = jnp.pad(a2d, ((0, 0), (0, rp - r)))
        return a2d.reshape(nrows, nb, lanes)

    e_p = packrows(ev, na)
    x_p = packrows(xv.T, v)

    operands = [jnp.full((1, 1), seed, dtype=jnp.int32), e_p, x_p]
    in_specs = [
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((na, subrows, lanes), lambda i, j: (0, j, 0)),
        pl.BlockSpec((v, subrows, lanes), lambda i, j: (0, j, 0)),
    ]

    (out,) = pl.pallas_call(
        functools.partial(
            _perturb_poisson_kernel, na=na, v=v, out_group=out_group
        ),
        grid=(pp // rep_block, grid_j),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, rep_block, m), lambda i, j: (j // out_group, i, 0)
            )
        ],
        out_shape=[jax.ShapeDtypeStruct((npart, pp, m), jnp.float32)],
        interpret=interpret,
    )(*operands)

    return _perturb_epilogue(out, nrep, na, v)


@_interpret_eager_jit("rep_block", "out_group", "interpret")
def resample_perturb_freq(
    ev,
    xv,
    freq,
    *,
    rep_block: int = 128,
    out_group: int = 64,
    interpret: bool = False,
):
    r"""Perturbation bootstrap against a materialized frequency table —
    the table-shared MXU dot with EXACT count parity across kernel / XLA /
    AOT paths (they all consume the same ``poisson1_freq`` array; VERDICT
    r4 items 1+7).  Same contract as :func:`resample_perturb_poisson`
    with ``freq (nrep, R)`` replacing ``(nrep, seed)``; pass an int8
    table (Poisson(1) counts cannot overflow it) to stream the dominant
    HBM operand at 1/4 the f32 traffic.  Returns sums ``(A, nrep, V+1)``.
    """
    ev, xv, na, v, r = _perturb_prep(ev, xv)
    nrep = freq.shape[0]

    lanes = _LANES
    subrows = _REC_CHUNK // lanes
    if interpret:
        subrows = min(subrows, 16)
    chunk = subrows * lanes
    grid_i = (nrep + rep_block - 1) // rep_block
    grid_j = (r + chunk - 1) // chunk
    pp = grid_i * rep_block
    m = na * (1 + v)
    npart = (grid_j + out_group - 1) // out_group

    e_p = jnp.stack(
        [_freq_permute_pack(ev[a], grid_j, subrows, lanes) for a in range(na)]
    )
    x_p = jnp.stack(
        [
            _freq_permute_pack(xv[:, k], grid_j, subrows, lanes)
            for k in range(v)
        ]
    )
    freq = jnp.asarray(freq)
    if jnp.issubdtype(freq.dtype, jnp.floating):
        if freq.dtype not in (jnp.float32, jnp.bfloat16):
            freq = freq.astype(jnp.float32)
    elif freq.dtype not in (jnp.int8, jnp.int16, jnp.int32):
        freq = freq.astype(jnp.int32)
    if interpret:
        # full-block zero pad: see resample_central_comoments_fused
        freq = jnp.pad(freq, ((0, pp - nrep), (0, grid_j * chunk - r)))

    operands = [freq, e_p, x_p]
    in_specs = [
        pl.BlockSpec((rep_block, chunk), lambda i, j: (i, j)),
        pl.BlockSpec((na, subrows, lanes), lambda i, j: (0, j, 0)),
        pl.BlockSpec((v, subrows, lanes), lambda i, j: (0, j, 0)),
    ]

    (out,) = pl.pallas_call(
        functools.partial(
            _perturb_freq_kernel,
            na=na,
            v=v,
            n_real=r,
            lanes=lanes,
            subrows=subrows,
            out_group=out_group,
        ),
        grid=(grid_i, grid_j),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, rep_block, m), lambda i, j: (j // out_group, i, 0)
            )
        ],
        out_shape=[jax.ShapeDtypeStruct((npart, pp, m), jnp.float32)],
        interpret=interpret,
    )(*operands)

    return _perturb_epilogue(out, nrep, na, v)


def _reduce_u_batched_kernel(
    su_ref, u_ref, *rest, order, use_w, rows, n_real, lanes
):
    """Row-group FMA accumulation (same structure as :func:`_reduce_kernel`,
    u-moments only) with per-batch shifts indexed from SMEM."""
    if use_w:
        w_ref, out_ref = rest
    else:
        (out_ref,) = rest
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    su = su_ref[b, 0]
    u = u_ref[0].astype(jnp.float32)
    w = w_ref[0].astype(jnp.float32) if use_w else None
    g_count = rows // 8

    def body(masked: bool):
        acc_w = jnp.zeros((8, lanes), jnp.float32)
        acc = [jnp.zeros((8, lanes), jnp.float32) for _ in range(order)]
        for g in range(g_count):
            sl = slice(g * 8, (g + 1) * 8)
            du = u[sl] - su
            if masked:
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 0)
                lane_ids = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 1)
                flat = (j * rows + g * 8 + row_ids) * lanes + lane_ids
                mask = flat < n_real
                zero = jnp.zeros_like(du)
                du = jnp.where(mask, du, zero)
                wg = (
                    jnp.where(mask, w[sl], zero)
                    if use_w
                    else mask.astype(jnp.float32)
                )
            else:
                wg = w[sl] if use_w else None
            if wg is None:
                p = du
            else:
                acc_w = acc_w + wg
                p = wg * du
            for n in range(1, order + 1):
                acc[n - 1] = acc[n - 1] + p
                if n < order:
                    p = p * du
        if use_w or masked:
            out_ref[0, 0, :, :] += acc_w
        else:
            out_ref[0, 0, :, :] += jnp.full(
                (8, lanes), float(g_count), jnp.float32
            )
        for n in range(1, order + 1):
            out_ref[0, n, :, :] += acc[n - 1]

    last = pl.num_programs(1) - 1
    has_tail = n_real % (rows * lanes) != 0
    if has_tail:

        @pl.when(j < last)
        def _():
            body(False)

        @pl.when(j == last)
        def _():
            body(True)

    else:
        body(False)


@_interpret_eager_jit("order", "block", "interpret")
def reduce_central_umoments_batched(
    uv,
    order: int,
    weight=None,
    *,
    block: int = 131072,
    interpret: bool = False,
):
    r"""Fused central u-moment reduction for batched samples.

    ``uv``: ``(*batch, R)`` (e.g. macrostate grid x samples for lnPi);
    returns ``(uave (*batch,), du (order+1, *batch))`` with ``du[0]=1``,
    ``du[1]=0``.  Grid: (batch, rec blocks); each batch row reduces its own
    sample stream with the single-pass shifted accumulation.
    """
    uv = jnp.asarray(uv, dtype=jnp.float32)
    batch_shape = uv.shape[:-1]
    r = uv.shape[-1]
    u2 = uv.reshape(-1, r)
    nbatch = u2.shape[0]

    w2 = (
        None
        if weight is None
        else jnp.broadcast_to(jnp.asarray(weight, jnp.float32), uv.shape).reshape(
            -1, r
        )
    )

    s_u = _head_shift_batched(u2, w2)  # (nbatch,)

    # zero-copy (nbatch, R) -> (nbatch, rows, 128) bitcast (128 lanes is
    # the only layout-preserving width — see the module docstring); pad
    # fallback only when R % 128 != 0.  Partial final rec-block handled by
    # the where-masked tail.
    lanes = _LANES
    rows = max(block // lanes, 8) // 8 * 8
    if interpret:
        rows = min(rows, 32)  # see reduce_central_comoments_fused
    rows_needed = ((r + lanes - 1) // lanes + 7) // 8 * 8
    rows = min(rows, rows_needed)
    nb_rows = (r + lanes - 1) // lanes
    grid_j = (nb_rows + rows - 1) // rows
    # interpret: full-block zero pad (see reduce_central_comoments_fused)
    rows_pad = grid_j * rows if interpret else nb_rows

    def packb(a):
        if r == rows_pad * lanes:
            return a.reshape(nbatch, rows_pad, lanes)  # bitcast, zero copy
        return jnp.pad(a, ((0, 0), (0, rows_pad * lanes - r))).reshape(
            nbatch, rows_pad, lanes
        )

    operands = [s_u.reshape(nbatch, 1), packb(u2)]
    in_specs = [
        # whole shift vector in SMEM; indexed by program_id(0) in-kernel
        pl.BlockSpec((nbatch, 1), lambda b, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, rows, lanes), lambda b, j: (b, j, 0)),
    ]
    use_w = w2 is not None
    if use_w:
        operands.append(packb(w2))
        in_specs.append(pl.BlockSpec((1, rows, lanes), lambda b, j: (b, j, 0)))

    (out,) = pl.pallas_call(
        functools.partial(
            _reduce_u_batched_kernel,
            order=order,
            use_w=use_w,
            rows=rows,
            n_real=r,
            lanes=lanes,
        ),
        grid=(nbatch, grid_j),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, order + 1, 8, lanes), lambda b, j: (b, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbatch, order + 1, 8, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    sums = out.sum(axis=(2, 3)).T  # (order+1, nbatch)
    wsum = sums[0]
    m = sums / wsum
    uave = m[1] + s_u
    du = shift_raw_moments(m, m[1])
    du = du.at[0].set(1.0).at[1].set(0.0)
    return uave.reshape(batch_shape), du.reshape((order + 1, *batch_shape))


def _u_batched_xla(uv, w, order: int):
    """Two-pass weighted batched central u-moments in XLA (backward-pass
    reference for the AD wrapper): ``(uave (*batch,), du (order+1, *batch))``."""
    w = jnp.ones_like(uv) if w is None else jnp.broadcast_to(w, uv.shape)
    wsum = w.sum(-1)
    uave = (w * uv).sum(-1) / wsum
    d = uv - uave[..., None]
    rows = [jnp.ones_like(uave), jnp.zeros_like(uave)]
    p = d * d
    for _ in range(2, order + 1):
        rows.append((w * p).sum(-1) / wsum)
        p = p * d
    # order 0 must emit exactly one row (the ones), not the [ones, zeros]
    # seed pair — the AD wrapper's vjp reference must match du's shape
    return uave, jnp.stack(rows[: order + 1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def reduce_central_umoments_batched_ad(uv, w, order: int):
    r"""Differentiable wrapper around the batched u-moment kernel: Pallas
    forward, backward delegated to jax autodiff of the XLA two-pass
    formulation.  ``w`` may be ``None``."""
    return reduce_central_umoments_batched(uv, order, weight=w)


def _u_batched_ad_fwd(uv, w, order: int):
    return reduce_central_umoments_batched(uv, order, weight=w), (uv, w)


def _u_batched_ad_bwd(order: int, res, cts):
    uv, w = res
    cts = tuple(jnp.asarray(c, jnp.result_type(uv)) for c in cts)
    if w is None:
        _, vjp = jax.vjp(lambda u: _u_batched_xla(u, None, order), uv)
        (gu,) = vjp(cts)
        return gu, None
    _, vjp = jax.vjp(lambda u, ww: _u_batched_xla(u, ww, order), uv, w)
    gu, gw = vjp(cts)
    return gu, gw


reduce_central_umoments_batched_ad.defvjp(_u_batched_ad_fwd, _u_batched_ad_bwd)


# ---------------------------------------------------------------------------
# batched x != u comoment reduction (arbitrary batch axes x val axes, the
# cmomy arbitrary-dim reduction role, reference data.py:1632-1640)
# ---------------------------------------------------------------------------


def _reduce_co_batched_kernel(
    su_ref, sx_ref, u_ref, x_ref, *rest, order, use_w, rows, n_real, v, lanes
):
    """Per grid step ``(b, j)``: u block ``(1, rows, B)``, x block
    ``(1, v, rows, B)``; per-batch shifts indexed from SMEM by the batch
    program id.  Row-group FMA accumulation mirroring
    :func:`_reduce_kernel`, one output tile row per batch."""
    if use_w:
        w_ref, out_u_ref, out_xu_ref = rest
    else:
        out_u_ref, out_xu_ref = rest
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_u_ref[:] = jnp.zeros_like(out_u_ref)
        out_xu_ref[:] = jnp.zeros_like(out_xu_ref)

    su = su_ref[b, 0]
    sx = [sx_ref[b, k] for k in range(v)]
    u = u_ref[0].astype(jnp.float32)
    xs = [x_ref[0, k].astype(jnp.float32) for k in range(v)]
    w = w_ref[0].astype(jnp.float32) if use_w else None
    g_count = rows // 8

    def body(masked: bool):
        acc_w = jnp.zeros((8, lanes), jnp.float32)
        acc_u = [jnp.zeros((8, lanes), jnp.float32) for _ in range(order)]
        acc_x = [
            jnp.zeros((8, lanes), jnp.float32) for _ in range(v * (order + 1))
        ]
        for g in range(g_count):
            sl = slice(g * 8, (g + 1) * 8)
            du = u[sl] - su
            xt = [xs[k][sl] - sx[k] for k in range(v)]
            if masked:
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 0)
                lane_ids = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 1)
                flat = (j * rows + g * 8 + row_ids) * lanes + lane_ids
                mask = flat < n_real
                zero = jnp.zeros_like(du)
                du = jnp.where(mask, du, zero)
                xt = [jnp.where(mask, xk, zero) for xk in xt]
                wg = (
                    jnp.where(mask, w[sl], zero)
                    if use_w
                    else mask.astype(jnp.float32)
                )
            else:
                wg = w[sl] if use_w else None
            if wg is None:
                p = du
            else:
                acc_w = acc_w + wg
                p = wg * du
            for k in range(v):
                acc_x[k * (order + 1)] = (
                    (xt[k] + acc_x[k * (order + 1)])
                    if wg is None
                    else (wg * xt[k] + acc_x[k * (order + 1)])
                )
            for n in range(1, order + 1):
                acc_u[n - 1] = acc_u[n - 1] + p
                for k in range(v):
                    acc_x[k * (order + 1) + n] = (
                        p * xt[k] + acc_x[k * (order + 1) + n]
                    )
                if n < order:
                    p = p * du
        if use_w or masked:
            out_u_ref[0, 0, :, :] += acc_w
        else:
            out_u_ref[0, 0, :, :] += jnp.full(
                (8, lanes), float(g_count), jnp.float32
            )
        for n in range(1, order + 1):
            out_u_ref[0, n, :, :] += acc_u[n - 1]
        for jj in range(v * (order + 1)):
            out_xu_ref[0, jj, :, :] += acc_x[jj]

    last = pl.num_programs(1) - 1
    has_tail = n_real % (rows * lanes) != 0
    if has_tail:

        @pl.when(j < last)
        def _():
            body(False)

        @pl.when(j == last)
        def _():
            body(True)

    else:
        body(False)


@_interpret_eager_jit("order", "block", "interpret")
def reduce_central_comoments_batched(
    uv,
    xv,
    order: int,
    weight=None,
    *,
    block: int = 262144,
    interpret: bool = False,
):
    r"""Fused single-pass central comoment reduction with batch axes.

    ``uv``: ``(*batch, R)``; ``xv``: ``(*batch, R, *val)``; same return
    contract as :func:`ops.moments.reduce_central_comoments` — the batched
    fast path the reference delegates to one cmomy call over arbitrary dims
    (/root/reference/src/thermoextrap/data.py:1632-1640).

    Grid is (batch, rec blocks); each batch row streams its own samples with
    the shifted single-pass accumulation (per-batch shift from the first
    chunk).  ``block`` bounds the per-step u-block size; the x block scales
    it by ``v``, so the default keeps VMEM well under the 16 MB scoped limit
    for small-to-moderate ``v``.  bfloat16 inputs stream at half traffic.
    """
    uv = jnp.asarray(uv)
    xv = jnp.asarray(xv)
    in_dtype = _stream_dtype(uv, xv)
    uv = uv.astype(in_dtype)
    batch_shape = uv.shape[:-1]
    r = uv.shape[-1]
    val_shape = xv.shape[uv.ndim :]
    u2 = uv.reshape(-1, r)
    nbatch = u2.shape[0]
    x3 = xv.astype(in_dtype).reshape(nbatch, r, -1)
    v = x3.shape[-1]

    w2 = (
        None
        if weight is None
        else jnp.broadcast_to(jnp.asarray(weight, jnp.float32), uv.shape).reshape(
            -1, r
        )
    )

    s_u, s_x = _head_shift_batched(u2, w2, x3)  # (nbatch,), (nbatch, v)

    sub = 16 if in_dtype == jnp.bfloat16 else 8
    # zero-copy bitcast packing at the layout-preserving 128-lane width
    # (v==1 x stream included); the v>1 x stream pays its transposed copy
    # regardless
    lanes = _LANES
    rows = max(block // (lanes * max(v, 1)), sub) // sub * sub
    if interpret:
        rows = min(rows, 4 * sub)  # see reduce_central_comoments_fused
    rows_needed = ((r + lanes - 1) // lanes + sub - 1) // sub * sub
    rows = min(rows, rows_needed)
    nb_rows = (r + lanes - 1) // lanes
    grid_j = (nb_rows + rows - 1) // rows
    # interpret: full-block zero pad (see reduce_central_comoments_fused)
    rows_pad = grid_j * rows if interpret else nb_rows
    rp = rows_pad * lanes

    def packb(a):
        if r == rp:
            return a.reshape(nbatch, rows_pad, lanes)  # bitcast, zero copy
        return jnp.pad(a, ((0, 0), (0, rp - r))).reshape(
            nbatch, rows_pad, lanes
        )

    u_p = packb(u2)
    if v == 1:
        x_p = packb(x3[:, :, 0])[:, None]  # free reshape, no transpose
    else:
        # one transposed copy: (nbatch, R, v) -> (nbatch, v, rows, lanes)
        x_p = (
            jnp.pad(x3, ((0, 0), (0, rp - r), (0, 0)))
            .transpose(0, 2, 1)
            .reshape(nbatch, v, rows_pad, lanes)
        )

    operands = [s_u.reshape(nbatch, 1), s_x.reshape(nbatch, v), u_p, x_p]
    in_specs = [
        pl.BlockSpec((nbatch, 1), lambda b, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((nbatch, v), lambda b, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, rows, lanes), lambda b, j: (b, j, 0)),
        pl.BlockSpec((1, v, rows, lanes), lambda b, j: (b, 0, j, 0)),
    ]
    use_w = w2 is not None
    if use_w:
        operands.append(packb(w2))
        in_specs.append(pl.BlockSpec((1, rows, lanes), lambda b, j: (b, j, 0)))

    out_u, out_xu = pl.pallas_call(
        functools.partial(
            _reduce_co_batched_kernel,
            order=order,
            use_w=use_w,
            rows=rows,
            n_real=r,
            v=v,
            lanes=lanes,
        ),
        grid=(nbatch, grid_j),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, order + 1, 8, lanes), lambda b, j: (b, 0, 0, 0)),
            pl.BlockSpec(
                (1, v * (order + 1), 8, lanes), lambda b, j: (b, 0, 0, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbatch, order + 1, 8, lanes), jnp.float32),
            jax.ShapeDtypeStruct(
                (nbatch, v * (order + 1), 8, lanes), jnp.float32
            ),
        ],
        interpret=interpret,
    )(*operands)

    sum_u = jnp.moveaxis(out_u.sum(axis=(2, 3)), 1, 0)  # (order+1, nbatch)
    sum_xu = jnp.moveaxis(
        out_xu.sum(axis=(2, 3)).reshape(nbatch, v, order + 1), 2, 0
    )  # (order+1, nbatch, v)

    wsum = sum_u[0]
    m = sum_u / wsum
    c = sum_xu / wsum[:, None]

    uave = m[1] + s_u
    xave = c[0] + s_x

    du = shift_raw_moments(m, m[1])
    x_du = shift_raw_comoments(c, m[1][:, None])
    dxdu = x_du - c[0][None] * du[:, :, None]
    du = du.at[0].set(1.0).at[1].set(0.0)
    dxdu = dxdu.at[0].set(0.0)
    return (
        xave.reshape(batch_shape + val_shape),
        uave.reshape(batch_shape),
        du.reshape((order + 1, *batch_shape)),
        dxdu.reshape((order + 1, *batch_shape, *val_shape)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def reduce_central_comoments_batched_ad(uv, xv, w, order: int):
    r"""Differentiable wrapper around the batched fused reduction: Pallas
    forward, backward delegated to jax autodiff of the XLA two-pass
    formulation (exact; moments are cheap to re-derive on the backward
    pass).  ``w`` may be ``None``."""
    return reduce_central_comoments_batched(uv, xv, order, weight=w)


def _batched_ad_fwd(uv, xv, w, order: int):
    out = reduce_central_comoments_batched(uv, xv, order, weight=w)
    return out, (uv, xv, w)


def _batched_ad_bwd(order: int, res, cts):
    from . import moments as _moments

    uv, xv, w = res
    val_ndim = jnp.ndim(xv) - jnp.ndim(uv)
    # the fused forward emits f32; the XLA backward works in the input dtype
    cts = tuple(jnp.asarray(c, jnp.result_type(uv)) for c in cts)

    if w is None:

        def f(u, x):
            return _moments.reduce_central_comoments(
                u, x, order, val_ndim=val_ndim
            )

        _, vjp = jax.vjp(f, uv, xv)
        gu, gx = vjp(cts)
        return gu, gx, None

    def f(u, x, ww):
        return _moments.reduce_central_comoments(
            u, x, order, weight=ww, val_ndim=val_ndim
        )

    _, vjp = jax.vjp(f, uv, xv, w)
    gu, gx, gw = vjp(cts)
    return gu, gx, gw


reduce_central_comoments_batched_ad.defvjp(_batched_ad_fwd, _batched_ad_bwd)


# ---------------------------------------------------------------------------
# custom VJP: autodiff through the fused reduction (the Pallas forward has
# no transpose rule; the backward has closed forms in the outputs)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def reduce_central_comoments_fused_ad(uv, xv, w, order: int):
    r"""Differentiable wrapper around the fused reduction.

    Same outputs as :func:`reduce_central_comoments_fused`; ``w`` may be
    ``None`` (unweighted; the kernel then skips the weight stream).
    Backward pass implements the exact closed-form cotangents, e.g.

    .. math:: \partial du_n / \partial u_j
              = (w_j/W)\, n\,[(u_j-\bar u)^{n-1} - du_{n-1}]

    evaluated as per-sample polynomials in :math:`u_j - \bar u` — one
    streaming XLA pass.
    """
    return reduce_central_comoments_fused(uv, xv, order, weight=w)


def _fused_ad_fwd(uv, xv, w, order: int):
    out = reduce_central_comoments_fused(uv, xv, order, weight=w)
    return out, (uv, xv, w, out)


def _fused_ad_bwd(order: int, res, cts):
    uv, xv, w, (xave, uave, du, dxdu) = res
    no_weight = w is None
    if no_weight:
        w = jnp.ones_like(uv)
    gx, guave, gdu, gdxdu = cts
    gx = jnp.zeros_like(xave) if gx is None else gx
    guave = jnp.zeros_like(uave) if guave is None else guave
    gdu = jnp.zeros_like(du) if gdu is None else gdu
    gdxdu = jnp.zeros_like(dxdu) if gdxdu is None else gdxdu

    val_shape = xv.shape[1:]
    xflat = xv.reshape(uv.shape[0], -1)
    v = xflat.shape[1]
    gx_f = gx.reshape(v)
    gdxdu_f = gdxdu.reshape(order + 1, v)
    xave_f = xave.reshape(v)
    dxdu_f = dxdu.reshape(order + 1, v)

    wsum = w.sum()
    wn = w / wsum
    t = uv - uave  # (R,)
    s = xflat - xave_f[None, :]  # (R, V)

    # power stack t^0..t^order
    pw = [jnp.ones_like(t)]
    for _ in range(order):
        pw.append(pw[-1] * t)

    # d/du_j:  (w_j/W) [guave + P(t_j) - c1 + sum_v s_jv Q_v(t_j) - c2]
    p_t = sum(n * gdu[n] * pw[n - 1] for n in range(1, order + 1))
    c1 = sum(n * gdu[n] * du[n - 1] for n in range(1, order + 1))
    q_t = sum(
        n * gdxdu_f[n][None, :] * pw[n - 1][:, None] for n in range(1, order + 1)
    )  # (R, V)
    c2 = sum(n * (gdxdu_f[n] * dxdu_f[n - 1]).sum() for n in range(1, order + 1))
    gu_bar = wn * (guave + p_t - c1 + (s * q_t).sum(axis=1) - c2)

    # d/dx_jv: (w_j/W) [gx_v + R_v(t_j) - c3_v]
    r_t = sum(gdxdu_f[n][None, :] * pw[n][:, None] for n in range(order + 1))
    c3 = sum(gdxdu_f[n] * du[n] for n in range(order + 1))
    gx_bar = wn[:, None] * (gx_f[None, :] + r_t - c3[None, :])

    # d/dw_j (for completeness; weights rarely differentiated)
    tpow = jnp.stack(pw, axis=0)  # (order+1, R)
    du_term = sum(
        gdu[n] * (tpow[n] - du[n] - n * du[n - 1] * t) for n in range(order + 1)
    )
    dxdu_term = sum(
        (
            gdxdu_f[n][None, :]
            * (
                s * tpow[n][:, None]
                - dxdu_f[n][None, :]
                - s * du[n]
                - n * dxdu_f[n - 1][None, :] * t[:, None]
            )
        ).sum(axis=1)
        for n in range(order + 1)
    )
    if no_weight:
        return gu_bar, gx_bar.reshape(xv.shape), None
    gw_bar = (
        (s * gx_f[None, :]).sum(axis=1) + guave * t + du_term + dxdu_term
    ) / wsum

    return gu_bar, gx_bar.reshape(xv.shape), gw_bar


reduce_central_comoments_fused_ad.defvjp(_fused_ad_fwd, _fused_ad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def resample_central_comoments_fused_ad(uv, xv, freq, order: int, weight=None):
    r"""Differentiable wrapper around the fused bootstrap: Pallas forward,
    backward delegated to jax autodiff of the XLA freq-matmul formulation
    (exact; only materializes the contribution matrix when differentiating).
    ``freq`` is non-differentiable (integer counts)."""
    return resample_central_comoments_fused(uv, xv, freq, order, weight=weight)


def _resample_ad_fwd(uv, xv, freq, order: int, weight=None):
    out = resample_central_comoments_fused(uv, xv, freq, order, weight=weight)
    return out, (uv, xv, freq, weight)


def _resample_ad_bwd(order: int, res, cts):
    from . import resample as _resample

    uv, xv, freq, weight = res
    # the fused forward emits f32; the XLA backward works in the input dtype
    cts = tuple(jnp.asarray(c, uv.dtype) for c in cts)

    if weight is None:

        def f(u, x):
            return _resample.resample_central_comoments(u, x, freq, order)

        _, vjp = jax.vjp(f, uv, xv)
        gu, gx = vjp(cts)
        return gu, gx, None, None

    def f(u, x, w):
        return _resample.resample_central_comoments(u, x, freq, order, weight=w)

    _, vjp = jax.vjp(f, uv, xv, weight)
    gu, gx, gw = vjp(cts)
    return gu, gx, None, gw


resample_central_comoments_fused_ad.defvjp(_resample_ad_fwd, _resample_ad_bwd)
