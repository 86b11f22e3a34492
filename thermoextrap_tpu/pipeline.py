r"""One-dispatch serving pipelines: samples → extrapolation (+ bootstrap CI).

TPU-native addition (no reference analogue — the reference workflow is the
eager ``ExtrapModel.predict`` + ``resample`` pair, models.py:487-576).  On a
serving path every host→device dispatch carries fixed overhead (milliseconds
through a remote tunnel), so the production shape of the workflow is a
SINGLE jitted program that runs the full chain in one dispatch:

    fused Pallas moment reduction  →  truncated-series derivative engine
    →  Taylor evaluation           →  (optional) in-kernel Poisson
                                       bootstrap for uncertainty

The returned function is a pure jax program: embeddable in larger jit/pjit
programs and compiled exactly once per input shape.  The reduction paths
carry custom VJPs, so predictions are differentiable end-to-end; the
Poisson-bootstrap CI branch is forward-only (its frequencies are generated
by the in-kernel PRNG and cannot be replayed by a backward pass) — for
gradients through the CI use the mesh/CPU freq-table path or ``nrep=0``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .models.derivatives import (
    central_u_ave_coefs,
    central_x_ave_coefs,
    central_x_ave_coefs_xalpha,
    lnpi_coefs,
)
from .models.extrap import _poly_eval
from .ops import dispatch
from .ops.resample import poisson1_freq
from .ops.series import series_neg_log

__all__ = [
    "make_bucketed_extrap_runner",
    "make_extrap_pipeline",
    "make_gpr_pipeline",
    "make_lnpi_pipeline",
    "make_perturb_pipeline",
    "make_streaming_extrap_pipeline",
    "make_streaming_interp_pipeline",
    "make_streaming_lnpi_pipeline",
    "make_streaming_perturb_pipeline",
    "make_streaming_volume_pipeline",
    "make_volume_pipeline",
    "streaming_jackknife",
]


def _xalpha_mean_coefs(xave, du, dxdu, order):
    """xalpha coefficient assembly over the FLAT packed value width: the
    flat V packs (order+1 deriv columns) × (vv observable values).
    ``xave (V,)``, ``du (order+1, 1)``, ``dxdu (order+1, V)``.  Shared by
    the live pipeline and the AOT export tracer so the layout contract
    cannot drift between them."""
    vv = xave.shape[-1] // (order + 1)
    return central_x_ave_coefs_xalpha(
        xave.reshape(order + 1, vv),
        du,
        dxdu.reshape(order + 1, order + 1, vv),
        order,
    )


def _xalpha_boot_coefs(bx, bdu, bdxdu, nrep, order):
    """Bootstrap variant of :func:`_xalpha_mean_coefs`: ``bx (nrep, V)``,
    ``bdu (order+1, nrep, 1)``, ``bdxdu (order+1, nrep, V)``.  The xalpha
    recursion indexes the deriv axis at position 0 (x1) / 1 (dxdu), so it
    moves ahead of the replicate batch axis."""
    vv = bx.shape[-1] // (order + 1)
    x1 = jnp.moveaxis(bx.reshape(nrep, order + 1, vv), 1, 0)
    dx = jnp.moveaxis(bdxdu.reshape(order + 1, nrep, order + 1, vv), 2, 1)
    return central_x_ave_coefs_xalpha(x1, bdu, dx, order)


def make_extrap_pipeline(
    order: int,
    beta0: float,
    *,
    minus_log: bool = False,
    xalpha: bool = False,
    x_is_u: bool = False,
    nrep: int = 0,
    mesh=None,
    weighted: bool = False,
    bf16: bool = False,
):
    r"""Build a jitted ``run(uv, xv, betas, seed=0)`` for β extrapolation of
    ``<x>`` (the flagship observable, reference beta.py:277-301).

    Parameters
    ----------
    order : Taylor order (static).
    beta0 : reference inverse temperature the samples were drawn at.
    minus_log : predict ``-log <x>`` (series-log transform of the
        coefficients, reference ``SymMinusLog``, models.py:261-287).
    xalpha : the observable depends explicitly on β (reference
        three-argument ``dxdu`` functions, beta.py:129-161 — tutorial
        temperature-extrapolation cases 2 and 4).  ``xv`` then carries a
        derivative axis right after the sample axis holding
        :math:`d^k x/d\beta^k` at fixed configuration for
        ``k = 0..order``: ``xv (R, order+1, *val)``.  Composes with
        ``minus_log`` (case 4) and with every other option — the kernels
        reduce the derivative columns as extra value columns; only the
        coefficient assembly differs
        (:func:`~thermoextrap_tpu.models.derivatives.central_x_ave_coefs_xalpha`).
    x_is_u : the observable IS the energy: serve ``<u>(β)`` (the reference
        ``u_ave`` observable, beta.py:303-321) from the u-moment kernels at
        HALF the HBM traffic of the comoment path (one stream, the
        ``dxdu[n] = du[n+1]`` shift).  ``run`` then takes no ``xv``
        operand: ``run(uv, betas[, weight], seed=0) -> (A,)``.
        Mutually exclusive with ``xalpha``.
    nrep : if > 0, also return the bootstrap standard deviation of the
        prediction from ``nrep`` replicates.  On an accelerator the
        replicates come from the in-kernel Poisson bootstrap (no
        ``(nrep, R)`` table in HBM — scales to R=1e8 and beyond); on CPU
        from the XLA multinomial freq-table path.
    mesh : optional ``jax.sharding.Mesh`` with a ``"rec"`` axis (and
        optionally ``"rep"``).  The reduction and bootstrap then run
        sharded over devices (``parallel/sharded.py``: psum-merged partial
        moments over ICI); shard inputs with :func:`parallel.shard_rec`.
    weighted : if true, ``run`` takes a per-sample weight array as its
        final positional argument: ``run(uv, xv, betas, weight, seed=0)``
        (e.g. reweighting factors from a biased simulation, the
        ``DataWrapper.get_logweights`` role).
    bf16 : stream the samples through the kernels as bfloat16 (half the
        HBM traffic; in-kernel accumulation stays f32).  Only applied on
        an accelerator backend without a mesh — the CPU/mesh XLA paths
        would *compute* in bf16, which is not accuracy-gated.  The
        quantization effect on the moments is bounded by the delta-method
        gates (ACCURACY_1e8.json / ACCURACY_BOOTSTRAP_1E8.json).

    Returns
    -------
    ``run(uv, xv, betas, seed=0)`` where ``uv (R,)``, ``xv (R, *val)``
    (``(R, order+1, *val)`` with ``xalpha``), ``betas (A,)`` →
    ``pred (A, *val)`` or ``(pred, std)`` with ``std (A, *val)``.
    ``seed`` only matters when ``nrep > 0``.

    Examples
    --------
    >>> import numpy as np
    >>> run = make_extrap_pipeline(order=2, beta0=1.0)
    >>> uv = np.array([1.0, 2.0, 3.0, 4.0])
    >>> xv = np.array([[2.0], [4.0], [6.0], [8.0]])
    >>> pred = run(uv, xv, np.array([1.0]))  # at beta0: <x>
    >>> float(np.asarray(pred)[0, 0])
    5.0
    """
    # backend decided when the pipeline is built: Pallas bootstrap kernels
    # only lower on an accelerator
    on_accel = jax.default_backend() != "cpu"

    def _post(c):
        return series_neg_log(c) if minus_log else c

    def _coefs(xave, du, dxdu):
        # mean path: xave (V,), du (order+1, 1), dxdu (order+1, V)
        if xalpha:
            c = _xalpha_mean_coefs(xave, du, dxdu, order)
        else:
            c = central_x_ave_coefs(xave, du, dxdu, order)
        return _post(c)

    def _boot_coefs(bx, bdu, bdxdu):
        # bootstrap path: bx (nrep, V), bdu (order+1, nrep, 1),
        # bdxdu (order+1, nrep, V)
        if xalpha:
            c = _xalpha_boot_coefs(bx, bdu, bdxdu, nrep, order)
        else:
            c = central_x_ave_coefs(bx, bdu, bdxdu, order)
        return _post(c)

    use_bf16 = bf16 and on_accel and mesh is None

    @jax.jit
    def _run(uv, xv, betas, weight, seed):
        uv = jnp.asarray(uv)
        xv = jnp.asarray(xv)
        if use_bf16:
            uv = uv.astype(jnp.bfloat16)
            xv = xv.astype(jnp.bfloat16)
        if xalpha:
            if xv.ndim < 2 or xv.shape[1] != order + 1:
                msg = (
                    f"xalpha xv needs a deriv axis of size order+1="
                    f"{order + 1} after the sample axis, got {xv.shape}"
                )
                raise ValueError(msg)
            val_shape = xv.shape[2:]
        else:
            val_shape = xv.shape[1:]
        xflat = xv.reshape(uv.shape[0], -1)
        betas = jnp.atleast_1d(jnp.asarray(betas))
        dalpha = betas - beta0

        if mesh is not None:
            from .parallel import reduce_central_comoments_sharded

            xave, _uave, du, dxdu = reduce_central_comoments_sharded(
                uv, xflat, order, mesh, weight=weight
            )
        else:
            xave, _uave, du, dxdu = dispatch.reduce_central(
                uv, xflat, order, weight=weight
            )
        pred = _poly_eval(_coefs(xave, du[:, None], dxdu), dalpha)
        pred = pred.reshape(betas.shape + val_shape)
        if not nrep:
            return pred

        if mesh is not None:
            from .ops.resample import freq_from_indices, random_indices
            from .parallel import resample_central_comoments_sharded

            r = uv.shape[0]
            freq = freq_from_indices(
                random_indices(jax.random.key(seed), nrep, r), r
            )
            bx, _bu, bdu, bdxdu = resample_central_comoments_sharded(
                uv, xflat, freq, order, mesh, weight=weight
            )
        elif on_accel:
            from .ops.moments_pallas import resample_central_comoments_poisson

            bx, _bu, bdu, bdxdu = resample_central_comoments_poisson(
                uv, xflat, nrep, order, weight=weight, seed=seed
            )
        else:
            from .ops.resample import (
                freq_from_indices,
                random_indices,
                resample_central_comoments,
            )

            r = uv.shape[0]
            freq = freq_from_indices(
                random_indices(jax.random.key(seed), nrep, r), r
            )
            bx, _bu, bdu, bdxdu = resample_central_comoments(
                uv, xflat, freq, order, weight=weight
            )

        bpred = _poly_eval(_boot_coefs(bx, bdu[:, :, None], bdxdu), dalpha)
        std = bpred.std(axis=1).reshape(betas.shape + val_shape)
        return pred, std

    @jax.jit
    def _run_u(uv, betas, weight, seed):
        # <u>(β) from u-moments only: half the stream traffic (the
        # dxdu[n] = du[n+1] shift makes <u> a special case of <x>)
        uv = jnp.asarray(uv)
        if use_bf16:
            uv = uv.astype(jnp.bfloat16)
        betas = jnp.atleast_1d(jnp.asarray(betas))
        dalpha = betas - beta0

        if mesh is not None:
            from .parallel import reduce_central_umoments_batched_sharded

            uave_b, du_full_b = reduce_central_umoments_batched_sharded(
                uv[None], order + 1, mesh, weight=weight
            )
            uave, du_full = uave_b[0], du_full_b[:, 0]
        else:
            uave, _u, du_m, dxdu_m = dispatch.reduce_central(
                uv, uv, order, weight=weight, val_ndim=0, x_is_u=True
            )
            du_full = jnp.concatenate([du_m, dxdu_m[-1:]], axis=0)
        # the purpose-built <u> assembly (dxdu[n] = du[n+1] shift built in)
        pred = _poly_eval(
            _post(central_u_ave_coefs(uave, du_full, order)), dalpha
        )
        if not nrep:
            return pred

        if mesh is not None:
            from .ops.resample import freq_from_indices, random_indices
            from .parallel import resample_central_umoments_batched_sharded

            r = uv.shape[0]
            freq = freq_from_indices(
                random_indices(jax.random.key(seed), nrep, r), r
            )
            bu, bdu_full = resample_central_umoments_batched_sharded(
                uv[None], freq, order + 1, mesh, weight=weight
            )
        elif on_accel:
            from .ops.moments_pallas import (
                resample_central_umoments_batched_poisson,
            )

            bu, bdu_full = resample_central_umoments_batched_poisson(
                uv[None], nrep, order + 1, weight=weight, seed=seed
            )
        else:
            from .ops.resample import (
                freq_from_indices,
                random_indices,
                resample_central_umoments_batched,
            )

            r = uv.shape[0]
            freq = freq_from_indices(
                random_indices(jax.random.key(seed), nrep, r), r
            )
            bu, bdu_full = resample_central_umoments_batched(
                uv[None], freq, order + 1, weight=weight
            )
        # bu (nrep, 1), bdu_full (order+2, nrep, 1): drop the dummy batch
        # column and assemble per replicate
        bcoefs = _post(
            central_u_ave_coefs(bu[:, 0], bdu_full[..., 0], order)
        )
        std = _poly_eval(bcoefs, dalpha).std(axis=1)
        return pred, std

    if x_is_u:
        if xalpha:
            msg = "x_is_u and xalpha are mutually exclusive"
            raise ValueError(msg)
        if weighted:

            def run(uv, betas, weight, seed=0):
                return _run_u(uv, betas, weight, seed)

        else:

            def run(uv, betas, seed=0):
                return _run_u(uv, betas, None, seed)

        return run

    if weighted:

        def run(uv, xv, betas, weight, seed=0):
            return _run(uv, xv, betas, weight, seed)

    else:

        def run(uv, xv, betas, seed=0):
            return _run(uv, xv, betas, None, seed)

    return run


def make_streaming_extrap_pipeline(
    order: int,
    beta0: float,
    *,
    minus_log: bool = False,
    xalpha: bool = False,
    x_is_u: bool = False,
    val_shape: tuple[int, ...] = (),
    dtype=jnp.float32,
    bf16: bool = False,
    mesh=None,
    nrep: int = 0,
    seed: int = 0,
    xla_only: bool = False,
):
    r"""Streaming variant of :func:`make_extrap_pipeline`: accumulate sample
    chunks online as a simulation runs, predict at any time — without
    retaining samples.  No reference analogue (the reference reduces
    complete timeseries in one shot, data.py:485-534).

    Each ``update`` reduces one chunk with the fused Pallas kernel and
    exactly pools it into the running moment state
    (:meth:`~thermoextrap_tpu.data.DataCentralMoments.push_vals` — the same
    shifted-moment merge as the sharded reduction, so the final state is
    bit-for-bit the one-shot answer up to floating-point associativity).
    The state is a pytree: ``update`` may also be used as a ``lax.scan``
    body over pre-chunked arrays inside a larger jitted program.  (Perf
    note: feeding chunks as separate buffers — one ``update`` call per
    chunk, or a ``fori_loop`` over per-chunk operands — runs at the fused
    kernel rate; a ``lax.scan`` over ONE monolithic ``(C, chunk)`` array
    makes XLA materialize each dynamic-sliced chunk before the Pallas
    call, ~2 extra stream copies per chunk.)

    Parameters
    ----------
    order, beta0, minus_log, xalpha, x_is_u : as in
        :func:`make_extrap_pipeline`.
        With ``xalpha`` each chunk's ``xv`` is ``(chunk, order+1, *val)``
        (β-derivative columns of the observable); the accumulator simply
        carries the derivative columns as extra value axes and only the
        prediction-time coefficient assembly differs.
        With ``x_is_u`` (serve ``<u>(β)`` from u-moments at half traffic)
        ``update`` takes no ``xv``: ``update(state, uv, weight=None)``.
    val_shape : trailing value shape of ``xv`` chunks (``()`` for scalar
        x), excluding the ``xalpha`` derivative axis; must be ``()``
        with ``x_is_u``.
    dtype : accumulator dtype (f32 matches the kernel accumulation width).
    bf16 : stream chunk samples as bfloat16 on an accelerator (half HBM
        traffic; in-kernel accumulation stays f32; the running state stays
        in ``dtype``).
    mesh : optional ``jax.sharding.Mesh`` with a ``"rec"`` axis: each
        chunk is reduced by the psum-merged sharded reduction
        (``parallel/sharded.py``) before the exact merge — shard chunks
        with :func:`parallel.shard_rec`.  The tiny accumulator state stays
        replicated.
    nrep : if > 0, the state additionally carries ``nrep`` Poisson-
        bootstrap replicate accumulators and ``predict`` returns
        ``(pred, std)``.  Each chunk is folded into every replicate with
        independent Poisson(1) frequencies — chunk-wise independent
        Poisson draws ARE one valid Poisson bootstrap of the whole stream
        (per-sample independence), so the CI converges to the one-shot
        bootstrap regardless of chunking; the realized replicate draws
        (not their distribution) depend on the chunk boundaries.  On an
        accelerator the frequencies come from the in-kernel PRNG (no
        ``(nrep, chunk)`` table in HBM); on CPU / under ``mesh`` from a
        :func:`~thermoextrap_tpu.ops.resample.poisson1_freq` table keyed
        on ``(seed, chunk index)``.
        Replicate state memory is ``nrep * (order+2) * prod(val_shape)``
        floats — negligible.
    seed : base PRNG seed for the replicate frequencies (``nrep > 0``).
    xla_only : force the pure-XLA compute paths even on an accelerator
        backend (the :func:`~thermoextrap_tpu.ops.resample.poisson1_freq`
        frequency table instead of the in-kernel Mosaic PRNG).  Required when the update/predict programs
        are AOT-exported for multiple platforms
        (:func:`~thermoextrap_tpu.serving_export.export_streaming_extrap_pipeline`).

    Returns
    -------
    ``(state0, update, predict)`` — ``state0`` the empty accumulator,
    ``update(state, uv, xv, weight=None) -> state`` (jitted),
    ``predict(state, betas) -> (A, *val_shape)`` (jitted), or
    ``-> (pred, std)`` when ``nrep > 0``.

    Examples
    --------
    >>> import numpy as np
    >>> state, update, predict = make_streaming_extrap_pipeline(2, 1.0)
    >>> state = update(state, np.array([1.0, 2.0]), np.array([2.0, 4.0]))
    >>> state = update(state, np.array([3.0, 4.0]), np.array([6.0, 8.0]))
    >>> float(np.asarray(predict(state, np.array([1.0])))[0])  # <x> at beta0
    5.0
    """
    from .data import DataCentralMoments
    from .utils.trees import replace

    if x_is_u and xalpha:
        msg = "x_is_u and xalpha are mutually exclusive"
        raise ValueError(msg)
    if x_is_u and tuple(val_shape):
        msg = "x_is_u streams scalar energies; val_shape must be ()"
        raise ValueError(msg)
    on_accel = jax.default_backend() != "cpu" and not xla_only
    use_bf16 = bf16 and on_accel and mesh is None
    # with xalpha the derivative columns ride along as a leading value
    # axis of the accumulator; they are disentangled only at predict time
    val_shape = (
        (order + 1, *val_shape) if xalpha else tuple(val_shape)
    )
    pad = (1,) * len(val_shape)

    mean0 = DataCentralMoments.zeros(
        order, val_shape=val_shape, dtype=dtype, x_is_u=x_is_u
    )
    if nrep:
        rep0 = DataCentralMoments.zeros(
            order,
            batch_shape=(nrep,),
            val_shape=val_shape,
            dtype=dtype,
            x_is_u=x_is_u,
        )
        state0 = (mean0, rep0, jnp.zeros((), jnp.int32))
    else:
        state0 = mean0

    def _mean_update(state, uv, xv, weight):
        if mesh is None:
            return state.push_vals(xv, uv, weight=weight)
        wsum = (
            jnp.asarray(float(uv.shape[0]), state.du.dtype)
            if weight is None
            else jnp.sum(jnp.asarray(weight))
        )
        if x_is_u:
            from .parallel import reduce_central_umoments_batched_sharded

            uave, du_full = reduce_central_umoments_batched_sharded(
                uv[None], order + 1, mesh, weight=weight
            )
            chunk_state = replace(
                state,
                xave=uave[0],
                uave=uave[0],
                du=du_full[: order + 1, 0],
                dxdu=du_full[1 : order + 2, 0],
                wsum=wsum.astype(state.wsum.dtype),
            )
            return state.merge(chunk_state)
        from .parallel import reduce_central_comoments_sharded

        xave, uave, du, dxdu = reduce_central_comoments_sharded(
            uv, xv.reshape(uv.shape[0], -1), order, mesh, weight=weight
        )
        chunk_state = replace(
            state,
            xave=xave.reshape(val_shape),
            uave=uave,
            du=du.reshape((order + 1, *pad)),
            dxdu=dxdu.reshape((order + 1, *val_shape)),
            wsum=wsum,
        )
        return state.merge(chunk_state)

    def _rep_update_u(rep, step, uv, weight):
        # x_is_u replicate fold: batched u-moment bootstrap on a dummy
        # batch row, du_full (order+2) giving the dxdu = du[n+1] shift
        if on_accel and mesh is None:
            from .ops.moments_pallas import (
                resample_central_umoments_batched_poisson,
            )

            chunk_seed = jnp.asarray(seed, jnp.int32) + step * jnp.int32(
                -1640531527
            )
            bu, bdu_full, bwsum = resample_central_umoments_batched_poisson(
                uv[None], nrep, order + 1, weight=weight,
                seed=chunk_seed, return_wsum=True,
            )
            bwsum = bwsum[:, 0]
        else:
            key = jax.random.fold_in(jax.random.key(seed), step)
            freq = poisson1_freq(key, (nrep, uv.shape[0]), dtype=jnp.int32)
            if mesh is not None:
                from .parallel import (
                    resample_central_umoments_batched_sharded,
                )

                bu, bdu_full = resample_central_umoments_batched_sharded(
                    uv[None], freq, order + 1, mesh, weight=weight
                )
            else:
                from .ops.resample import resample_central_umoments_batched

                bu, bdu_full = resample_central_umoments_batched(
                    uv[None], freq, order + 1, weight=weight
                )
            fw = freq.astype(rep.wsum.dtype)
            if weight is not None:
                fw = fw * jnp.asarray(weight, fw.dtype)[None, :]
            bwsum = fw.sum(axis=1)
        chunk_rep = replace(
            rep,
            xave=bu[:, 0],
            uave=bu[:, 0],
            du=bdu_full[: order + 1, :, 0],
            dxdu=bdu_full[1 : order + 2, :, 0],
            wsum=bwsum.astype(rep.wsum.dtype),
        )
        return rep.merge(chunk_rep)

    def _rep_update(rep, step, uv, xflat, weight):
        # fold this chunk into every bootstrap replicate with independent
        # Poisson(1) frequencies: per-sample independence makes chunk-wise
        # draws a valid Poisson bootstrap of the whole stream
        if on_accel and mesh is None:
            from .ops.moments_pallas import resample_central_comoments_poisson

            # distinct in-kernel PRNG seed per chunk (Knuth multiplicative
            # mix of the step counter; int32 wraparound is well-defined)
            chunk_seed = jnp.asarray(seed, jnp.int32) + step * jnp.int32(
                -1640531527
            )
            bx, _bu, bdu, bdxdu, bwsum = resample_central_comoments_poisson(
                uv, xflat, nrep, order, weight=weight,
                seed=chunk_seed, return_wsum=True,
            )
        else:
            key = jax.random.fold_in(jax.random.key(seed), step)
            freq = poisson1_freq(key, (nrep, uv.shape[0]), dtype=jnp.int32)
            if mesh is not None:
                from .parallel import resample_central_comoments_sharded

                bx, _bu, bdu, bdxdu = resample_central_comoments_sharded(
                    uv, xflat, freq, order, mesh, weight=weight
                )
            else:
                from .ops.resample import resample_central_comoments

                bx, _bu, bdu, bdxdu = resample_central_comoments(
                    uv, xflat, freq, order, weight=weight
                )
            fw = freq.astype(rep.wsum.dtype)
            if weight is not None:
                fw = fw * jnp.asarray(weight, fw.dtype)[None, :]
            bwsum = fw.sum(axis=1)
        chunk_rep = replace(
            rep,
            xave=bx.reshape(nrep, *val_shape),
            uave=_bu,
            du=bdu.reshape((order + 1, nrep, *pad)),
            dxdu=bdxdu.reshape((order + 1, nrep, *val_shape)),
            wsum=bwsum.astype(rep.wsum.dtype),
        )
        # a zero-weight replicate row (possible with Poisson freqs) carries
        # NaN/degenerate stats; the merge masks zero-weight members
        return rep.merge(chunk_rep)

    @jax.jit
    def _update_u(state, uv, weight):
        uv = jnp.asarray(uv)
        if use_bf16:
            uv = uv.astype(jnp.bfloat16)
        if nrep:
            mean_s, rep_s, step = state
            new = (
                _mean_update(mean_s, uv, None, weight),
                _rep_update_u(rep_s, step, uv, weight),
                step + 1,
            )
        else:
            new = _mean_update(state, uv, None, weight)
        return jax.tree.map(
            lambda new_leaf, old: new_leaf.astype(old.dtype), new, state
        )

    @jax.jit
    def _update_x(state, uv, xv, weight):
        uv = jnp.asarray(uv)
        xv = jnp.asarray(xv).reshape(uv.shape[0], *val_shape)
        if use_bf16:
            uv = uv.astype(jnp.bfloat16)
            xv = xv.astype(jnp.bfloat16)
        if nrep:
            mean_s, rep_s, step = state
            new = (
                _mean_update(mean_s, uv, xv, weight),
                _rep_update(rep_s, step, uv, xv.reshape(uv.shape[0], -1), weight),
                step + 1,
            )
        else:
            new = _mean_update(state, uv, xv, weight)
        # keep the carried state in the accumulator dtype regardless of the
        # chunk stream dtype, so repeated updates never change structure
        return jax.tree.map(
            lambda new_leaf, old: new_leaf.astype(old.dtype), new, state
        )

    if x_is_u:

        def update(state, uv, weight=None):
            return _update_u(state, uv, weight)

    else:

        def update(state, uv, xv, weight=None):
            return _update_x(state, uv, xv, weight)

    def _coefs(xave, du, dxdu, *, rep: bool = False):
        if xalpha:
            # the xalpha recursion indexes the deriv axis at position 0
            # (x1) / 1 (dxdu); in the accumulator it sits after the
            # replicate batch axis, and du carries its broadcast pad
            if rep:
                x1 = jnp.moveaxis(xave, 1, 0)
                dx = jnp.moveaxis(dxdu, 2, 1)
                du = jnp.squeeze(du, axis=2)
            else:
                x1, dx = xave, dxdu
                du = jnp.squeeze(du, axis=1)
            c = central_x_ave_coefs_xalpha(x1, du, dx, order)
        else:
            c = central_x_ave_coefs(xave, du, dxdu, order)
        return series_neg_log(c) if minus_log else c

    @jax.jit
    def predict(state, betas):
        betas = jnp.atleast_1d(jnp.asarray(betas))
        dalpha = betas - beta0
        if not nrep:
            return _poly_eval(
                _coefs(state.xave, state.du, state.dxdu), dalpha
            )
        mean_s, rep_s, _step = state
        pred = _poly_eval(_coefs(mean_s.xave, mean_s.du, mean_s.dxdu), dalpha)
        bpred = _poly_eval(
            _coefs(rep_s.xave, rep_s.du, rep_s.dxdu, rep=True), dalpha
        )
        return pred, bpred.std(axis=1)

    return state0, update, predict


def make_streaming_lnpi_pipeline(
    order: int,
    beta0: float,
    *,
    grid_shape: tuple[int, ...],
    dtype=jnp.float32,
    mesh=None,
    nrep: int = 0,
    seed: int = 0,
    xla_only: bool = False,
):
    r"""Streaming variant of :func:`make_lnpi_pipeline`: accumulate
    macrostate-grid energy-sample chunks online, predict lnΠ at any time.

    The state is a batched ``x_is_u`` moment container over the grid; each
    ``update`` reduces one ``(*grid_shape, chunk)`` energy block (batched
    u-moment Pallas kernel on an accelerator) and pools it elementwise
    into the grid state with the exact shifted-moment merge.  No reference
    analogue (the reference reduces complete lnΠ timeseries in one shot,
    reference lnpi.py:372-438 data path).

    Parameters
    ----------
    order, beta0 : as in :func:`make_lnpi_pipeline` (``order >= 1``).
    grid_shape : macrostate-grid batch shape of the incoming chunks.
    dtype : accumulator dtype.
    mesh : optional ``jax.sharding.Mesh`` with a ``"rec"`` axis — chunk
        reductions run psum-merged over devices; shard chunks on their
        LAST (rec) axis.
    nrep : if > 0, the state additionally carries ``nrep`` Poisson-
        bootstrap replicate grid accumulators and ``predict`` returns
        ``(pred, std)`` — the streaming analogue of
        :func:`make_lnpi_pipeline` ``nrep=`` (chunk-wise independent
        Poisson draws are a valid Poisson bootstrap of the whole stream;
        frequencies SHARED across the grid: replicates resample whole
        configurations, reference lnpi.py:258-286 semantics).  On an
        accelerator the frequencies come from the in-kernel PRNG; on
        CPU / under ``mesh`` from a per-chunk
        :func:`~thermoextrap_tpu.ops.resample.poisson1_freq` table keyed
        on ``(seed, chunk index)``.
    seed : base PRNG seed for the replicate frequencies (``nrep > 0``).
    xla_only : force the pure-XLA compute paths (AOT-export seam, as in
        :func:`make_streaming_extrap_pipeline`).

    Returns
    -------
    ``(state0, update, predict)`` — ``update(state, uv) -> state``
    (``uv (*grid_shape, chunk)``, jitted) and
    ``predict(state, lnpi0, mudotn, betas) -> (A, *grid_shape)`` (jitted),
    or ``-> (pred, std)`` when ``nrep > 0``.
    """
    if order < 1:
        msg = f"lnPi order must be >= 1, got {order}"
        raise ValueError(msg)
    from .data import DataCentralMoments
    from .utils.trees import replace

    on_accel = jax.default_backend() != "cpu" and not xla_only
    grid_shape = tuple(grid_shape)
    mean0 = DataCentralMoments.zeros(
        order, batch_shape=grid_shape, x_is_u=True, dtype=dtype
    )
    if nrep:
        rep0 = DataCentralMoments.zeros(
            order, batch_shape=(nrep, *grid_shape), x_is_u=True, dtype=dtype
        )
        state0 = (mean0, rep0, jnp.zeros((), jnp.int32))
    else:
        state0 = mean0

    def _mean_update(state, uv):
        if mesh is None:
            return state.push_vals(None, uv)
        from .parallel import reduce_central_umoments_batched_sharded

        # order+1 moments: the x_is_u state's dxdu is the shift view
        uave, du_full = reduce_central_umoments_batched_sharded(
            uv, order + 1, mesh
        )
        chunk_state = replace(
            state,
            xave=uave,
            uave=uave,
            du=du_full[: order + 1],
            dxdu=du_full[1 : order + 2],
            wsum=jnp.full(grid_shape, float(uv.shape[-1]), du_full.dtype),
        )
        return state.merge(chunk_state)

    def _rep_update(rep, step, uv):
        # fold this chunk into every replicate; freqs shared across the
        # grid so each replicate resamples whole configurations
        if on_accel and mesh is None:
            from .ops.moments_pallas import (
                resample_central_umoments_batched_poisson,
            )

            chunk_seed = jnp.asarray(seed, jnp.int32) + step * jnp.int32(
                -1640531527
            )
            bu, bdu_full, bwsum = resample_central_umoments_batched_poisson(
                uv, nrep, order + 1, seed=chunk_seed, return_wsum=True
            )
        else:
            key = jax.random.fold_in(jax.random.key(seed), step)
            freq = poisson1_freq(key, (nrep, uv.shape[-1]), dtype=jnp.int32)
            if mesh is not None:
                from .parallel import resample_central_umoments_batched_sharded

                bu, bdu_full = resample_central_umoments_batched_sharded(
                    uv, freq, order + 1, mesh
                )
            else:
                from .ops.resample import resample_central_umoments_batched

                bu, bdu_full = resample_central_umoments_batched(
                    uv, freq, order + 1
                )
            bwsum = jnp.broadcast_to(
                freq.sum(axis=1).astype(rep.wsum.dtype).reshape(
                    (nrep,) + (1,) * len(grid_shape)
                ),
                (nrep, *grid_shape),
            )
        chunk_rep = replace(
            rep,
            xave=bu,
            uave=bu,
            du=bdu_full[: order + 1],
            dxdu=bdu_full[1 : order + 2],
            wsum=bwsum.astype(rep.wsum.dtype),
        )
        # a zero-weight replicate row carries NaN stats; the merge masks
        # zero-weight members (ops/convert.merge_central_comoments)
        return rep.merge(chunk_rep)

    @jax.jit
    def update(state, uv):
        uv = jnp.asarray(uv)
        if nrep:
            mean_s, rep_s, step = state
            new = (
                _mean_update(mean_s, uv),
                _rep_update(rep_s, step, uv),
                step + 1,
            )
        else:
            new = _mean_update(state, uv)
        return jax.tree.map(
            lambda new_leaf, old: new_leaf.astype(old.dtype), new, state
        )

    def _coefs(uave, du, lnpi0, mudotn):
        u_c = central_u_ave_coefs(uave, du, order - 1)
        return lnpi_coefs(u_c, lnpi0, mudotn, order)

    @jax.jit
    def predict(state, lnpi0, mudotn, betas):
        lnpi0 = jnp.asarray(lnpi0)
        mudotn = jnp.asarray(mudotn)
        betas = jnp.atleast_1d(jnp.asarray(betas))
        dalpha = betas - beta0
        if not nrep:
            du = state.du.reshape((order + 1, *grid_shape))
            return _poly_eval(
                _coefs(state.uave, du, lnpi0, mudotn), dalpha
            )
        mean_s, rep_s, _step = state
        du = mean_s.du.reshape((order + 1, *grid_shape))
        pred = _poly_eval(_coefs(mean_s.uave, du, lnpi0, mudotn), dalpha)
        bdu = rep_s.du.reshape((order + 1, nrep, *grid_shape))
        bpred = _poly_eval(
            _coefs(rep_s.uave, bdu, lnpi0[None], mudotn[None]), dalpha
        )
        return pred, bpred.std(axis=1)

    return state0, update, predict


def make_streaming_volume_pipeline(
    volume0: float,
    *,
    ndim: int = 3,
    val_shape: tuple[int, ...] = (),
    dtype=jnp.float32,
    bf16: bool = False,
    mesh=None,
    nrep: int = 0,
    seed: int = 0,
    xla_only: bool = False,
):
    r"""Streaming variant of :func:`make_volume_pipeline`: accumulate
    ``(W, x, dxdq)`` sample chunks online, predict the first-order volume
    extrapolation at any time — without retaining samples.

    Mechanically this is the order-1 streaming comoment accumulator of
    :func:`make_streaming_extrap_pipeline` with ``x`` and ``dxdq`` packed
    as a leading value axis (``cov(x, W)`` is the order-1 central comoment
    of the first packed column; ``<dxdq>`` the mean of the second), plus
    the volume-specific prediction assembly — so chunk pooling, mesh
    sharding, per-chunk Poisson replicate folding, and checkpointing are
    all inherited exactly.

    Parameters
    ----------
    volume0, ndim : as in :func:`make_volume_pipeline`.
    val_shape, dtype, bf16, mesh, nrep, seed, xla_only : as in
        :func:`make_streaming_extrap_pipeline`.

    Returns
    -------
    ``(state0, update, predict)`` — ``update(state, wv, xv, dxdqv,
    weight=None) -> state`` (``wv (chunk,)`` the temperature-scaled
    virial, ``xv``/``dxdqv (chunk, *val_shape)``),
    ``predict(state, volumes) -> (A, *val_shape)`` or ``(pred, std)``
    when ``nrep > 0``.

    Examples
    --------
    >>> import numpy as np
    >>> state, update, predict = make_streaming_volume_pipeline(1.0, ndim=1)
    >>> wv = np.array([1.0, 2.0, 3.0, 4.0])
    >>> state = update(state, wv[:2], 2.0 * wv[:2], np.zeros(2))
    >>> state = update(state, wv[2:], 2.0 * wv[2:], np.zeros(2))
    >>> float(np.asarray(predict(state, np.array([1.0])))[0])  # <x> at V0
    5.0
    """
    val_shape = tuple(val_shape)
    v0d = float(volume0) * float(ndim)
    state0, _update, _ = make_streaming_extrap_pipeline(
        1,
        volume0,
        val_shape=(2, *val_shape),
        dtype=dtype,
        bf16=bf16,
        mesh=mesh,
        nrep=nrep,
        seed=seed,
        xla_only=xla_only,
    )

    def update(state, wv, xv, dxdqv, weight=None):
        xv = jnp.asarray(xv)
        dxdqv = jnp.asarray(dxdqv)
        if xv.shape != dxdqv.shape:
            msg = f"xv {xv.shape} and dxdqv {dxdqv.shape} must match"
            raise ValueError(msg)
        packed = jnp.stack(
            [
                xv.reshape(xv.shape[0], *val_shape),
                dxdqv.reshape(xv.shape[0], *val_shape),
            ],
            axis=1,
        )
        return _update(state, wv, packed, weight=weight)

    def _predict_from(xave, dxdu):
        # xave (*b, 2, *val): [x means, dxdq means]; dxdu (2, *b, 2, *val)
        x_mean = xave[..., 0, :] if val_shape else xave[..., 0]
        if val_shape:
            cov = dxdu[1][..., 0, :]
            dxdq = xave[..., 1, :]
        else:
            cov = dxdu[1][..., 0]
            dxdq = xave[..., 1]
        return x_mean, (cov + dxdq) / v0d

    @jax.jit
    def predict(state, volumes):
        volumes = jnp.atleast_1d(jnp.asarray(volumes))
        dalpha = volumes - volume0
        if not nrep:
            x_mean, deriv = _predict_from(state.xave, state.dxdu)
            da = dalpha.reshape((-1,) + (1,) * len(val_shape))
            return x_mean[None] + da * deriv[None]
        mean_s, rep_s, _step = state
        x_mean, deriv = _predict_from(mean_s.xave, mean_s.dxdu)
        da = dalpha.reshape((-1,) + (1,) * len(val_shape))
        pred = x_mean[None] + da * deriv[None]
        bx, bderiv = _predict_from(rep_s.xave, rep_s.dxdu)
        dab = dalpha.reshape((-1, 1) + (1,) * len(val_shape))
        bpred = bx[None] + dab * bderiv[None]  # (A, nrep, *val)
        return pred, bpred.std(axis=1)

    return state0, update, predict


def make_streaming_perturb_pipeline(
    beta0: float,
    betas,
    *,
    val_shape: tuple[int, ...] = (),
    dtype=jnp.float32,
    nrep: int = 0,
    seed: int = 0,
    xla_only: bool = False,
):
    r"""Streaming variant of :func:`make_perturb_pipeline`: fold sample
    chunks into per-target exponential-reweighting accumulators as a
    simulation runs — no sample retention.  No reference analogue (the
    reference ``PerturbModel`` holds the full timeseries,
    models.py:1009-1046).

    A running perturbation average needs a numerically stable online
    normalization, so the state carries, per target β, the *running
    maximum* ``m_a`` of the log-weights and max-shifted sums — the online
    softmax (flash-attention) recurrence: when a chunk raises the max,
    the old sums are rescaled by ``exp(m_old - m_new)`` before the chunk's
    contributions (``exp(logw - m_new)``) are added.  The final ``num/den``
    ratio is EXACTLY the one-shot stabilized reweight up to float
    associativity, for any chunking.

    The target β's are fixed at factory time (they define the
    accumulators); memory is ``O(A * (V + nrep))`` — samples never stick.

    Parameters
    ----------
    beta0 : reference state of the stream.
    betas : target inverse temperatures (A,) served by ``predict``.
    val_shape : trailing value shape of ``xv`` chunks (``()`` = scalar).
    dtype : accumulator dtype.
    nrep : if > 0 the state carries Poisson-bootstrap replicate sums and
        ``predict`` returns ``(pred, std)``; each chunk is folded into
        every replicate with independent Poisson(1) counts keyed on
        ``(seed, chunk index)`` — chunk-wise independent draws are a valid
        Poisson bootstrap of the whole stream (per-sample independence).
    seed : base PRNG seed for the replicate counts.
    xla_only : accepted for export-driver symmetry
        (:func:`~thermoextrap_tpu.serving_export.export_streaming_perturb_pipeline`);
        the perturb paths are already pure XLA, so it is a no-op.

    Returns
    -------
    ``(state0, update, predict)`` — ``update(state, uv, xv, weight=None)
    -> state`` (jitted; zero weights drop samples exactly),
    ``predict(state) -> (A, *val_shape)`` or ``(pred, std)``.

    Examples
    --------
    >>> import numpy as np
    >>> st, update, predict = make_streaming_perturb_pipeline(
    ...     1.0, np.array([1.0])
    ... )
    >>> st = update(st, np.array([1.0, 2.0]), np.array([2.0, 4.0]))
    >>> st = update(st, np.array([3.0, 4.0]), np.array([6.0, 8.0]))
    >>> float(np.asarray(predict(st))[0])  # at beta0: plain mean
    5.0
    """
    betas_c = jnp.atleast_1d(jnp.asarray(betas, dtype))
    a = betas_c.shape[0]
    v = int(np.prod(val_shape, dtype=np.int64)) if val_shape else 1
    dalpha = betas_c - jnp.asarray(beta0, dtype)

    state0 = [
        jnp.full((a,), -jnp.inf, dtype),  # running max of logw
        jnp.zeros((a, v), dtype),  # num = sum e * x
        jnp.zeros((a,), dtype),  # den = sum e
    ]
    if nrep:
        state0 += [
            jnp.zeros((a, nrep, v), dtype),
            jnp.zeros((a, nrep), dtype),
            jnp.zeros((), jnp.int32),  # chunk counter (PRNG keying)
        ]
    state0 = tuple(state0)

    @jax.jit
    def update(state, uv, xv, weight=None):
        uv = jnp.asarray(uv, dtype)
        xflat = jnp.asarray(xv, dtype).reshape(uv.shape[0], -1)
        logw = -dalpha[:, None] * uv[None, :]  # (A, chunk)
        if weight is not None:
            w = jnp.asarray(weight, dtype)
            logm = jnp.where(w > 0, jnp.log(jnp.where(w > 0, w, 1.0)), -jnp.inf)
            logw = logw + logm[None, :]
        m = state[0]
        new_m = jnp.maximum(m, jnp.max(logw, axis=1))
        # all-(-inf) targets (only zero-weight samples so far) stay zeroed;
        # the finite mask keeps exp(-inf - -inf) NaNs out of the recurrence
        finite = jnp.isfinite(new_m)
        safe_m = jnp.where(finite, new_m, 0.0)
        scale = jnp.where(finite, jnp.exp(m - safe_m), 0.0)  # (A,)
        e = jnp.where(
            finite[:, None], jnp.exp(logw - safe_m[:, None]), 0.0
        )  # (A, chunk)
        num = scale[:, None] * state[1] + jnp.matmul(
            e, xflat, precision=jax.lax.Precision.HIGHEST
        )
        den = scale * state[2] + e.sum(axis=1)
        if not nrep:
            return (new_m, num, den)
        bnum, bden, step = state[3], state[4], state[5]
        key = jax.random.fold_in(jax.random.key(seed), step)
        freq = poisson1_freq(key, (nrep, uv.shape[0]), dtype=dtype)

        def one(e_a):
            return jnp.matmul(
                freq,
                e_a[:, None] * xflat,
                precision=jax.lax.Precision.HIGHEST,
            )  # (nrep, V)

        bnum = scale[:, None, None] * bnum + jax.vmap(one)(e)
        bden = scale[:, None] * bden + jnp.matmul(
            e, freq.T, precision=jax.lax.Precision.HIGHEST
        )
        return (new_m, num, den, bnum, bden, step + 1)

    @jax.jit
    def predict(state):
        pred = (state[1] / state[2][:, None]).reshape((a, *val_shape))
        if not nrep:
            return pred
        bpred = state[3] / state[4][..., None]  # (A, nrep, V)
        std = bpred.std(axis=1).reshape((a, *val_shape))
        return pred, std

    return state0, update, predict


def make_streaming_interp_pipeline(
    order: int,
    beta0s,
    *,
    minus_log: bool = False,
    val_shape: tuple[int, ...] = (),
    dtype=jnp.float32,
    bf16: bool = False,
    mesh=None,
    nrep: int = 0,
    seed: int = 0,
):
    r"""Multi-state streaming interpolation serving: one online accumulator
    per reference inverse temperature, predictions from the JOINT
    polynomial through all states (:class:`~thermoextrap_tpu.models.extrap.
    InterpModel`, reference models.py:853-932) available at any time.

    This is the production topology of the reference's interpolation
    workflow (one simulation worker per state point feeding a shared
    interpolated surface, reference Temperature_Interp notebook) with the
    reference's one-shot reduction replaced by exact online accumulation —
    no samples retained anywhere.

    Parameters
    ----------
    order : per-state Taylor order (joint polynomial order is
        ``len(beta0s) * (order + 1) - 1``).
    beta0s : sequence of reference inverse temperatures.
    minus_log : interpolate ``-log <x>``.
    val_shape, dtype, bf16, mesh : as in
        :func:`make_streaming_extrap_pipeline` (shared by every state).
    nrep : if > 0, every state carries ``nrep`` Poisson-bootstrap
        replicate accumulators (per-chunk folding as in
        :func:`make_streaming_extrap_pipeline` ``nrep=``) and ``predict``
        returns ``(pred, std)`` — the joint system is solved per replicate
        (the replicate axis rides the solve's RHS batch dims).  Replicate
        draws are INDEPENDENT across states (each state derives its own
        PRNG seed): the states are independent simulations, so their
        bootstrap noise must not be correlated.
    seed : base PRNG seed for the replicate frequencies (``nrep > 0``).

    Returns
    -------
    ``(states0, update, predict)`` — ``states0`` a tuple of empty
    accumulators (one per β); ``update(states, i, uv, xv, weight=None) ->
    states`` folds a chunk from the simulation at ``beta0s[i]`` (the inner
    chunk reduce+merge is the jitted streaming update; ``i`` selects
    host-side); ``predict(states, betas) -> (A, *val_shape)`` solves the
    joint derivative-matching system (host f64 — the system is tiny and
    ill-conditioned in f32, see ``InterpModel.coefs``) over the current
    states, or ``-> (pred, std)`` when ``nrep > 0``.
    """
    beta0s = [float(b) for b in beta0s]
    if len(beta0s) < 2:
        msg = f"interpolation needs >= 2 reference states, got {len(beta0s)}"
        raise ValueError(msg)
    if nrep:
        # one pipeline per state: each bakes a distinct replicate-PRNG
        # seed (golden-ratio int mix; independent simulations must not
        # share bootstrap frequencies)
        pipes = [
            make_streaming_extrap_pipeline(
                order,
                b,
                val_shape=val_shape,
                dtype=dtype,
                bf16=bf16,
                mesh=mesh,
                nrep=nrep,
                seed=int((seed + 0x9E3779B9 * (i + 1)) & 0x7FFFFFFF),
            )
            for i, b in enumerate(beta0s)
        ]
        states0 = tuple(p[0] for p in pipes)
        updates = [p[1] for p in pipes]
    else:
        state0, _update, _ = make_streaming_extrap_pipeline(
            order,
            beta0s[0],
            val_shape=val_shape,
            dtype=dtype,
            bf16=bf16,
            mesh=mesh,
        )
        states0 = tuple(state0 for _ in beta0s)
        updates = [_update] * len(beta0s)

    def update(states, i, uv, xv, weight=None):
        i = int(i)
        states = list(states)
        states[i] = updates[i](states[i], uv, xv, weight=weight)
        return tuple(states)

    # state-independent: build once at pipeline construction, not per
    # predict call (the derivative engine and its coef kernels are shared
    # by every anytime prediction)
    from .beta import factory_derivatives
    from .models.derivatives import derivs_from_coefs
    from .models.extrap import eval_abs_poly, joint_interp_coefs

    derivatives = factory_derivatives("x_ave", central=True)

    # ONE jitted dispatch evaluates EVERY state's (and replicate leg's)
    # unnormalized derivative stack — on a remote-dispatch backend the
    # per-model eager path paid one ~5-25 ms round trip per state per leg
    # (measured: predict 0.167 s of the 0.24 s interp-CI serving call,
    # all dispatch).  The tiny joint solve stays host-f64
    # (joint_interp_coefs — the system is ill-conditioned in f32).
    @jax.jit
    def _derivs_all(data_states):
        # STACKED output: one device array (and so ONE device->host fetch
        # on a remote backend) for all states — per-state outputs cost a
        # tunnel round trip each
        return jnp.stack(
            [
                derivs_from_coefs(
                    derivatives.coefs(data=s, order=order, minus_log=minus_log)
                )
                for s in data_states
            ]
        )

    @jax.jit
    def _derivs_both(mean_states, rep_states):
        # mean + replicate legs in ONE dispatch (shapes differ, so two
        # stacked outputs; still a single program launch)
        return _derivs_all(mean_states), _derivs_all(rep_states)

    def _solve_eval(derivs_np, betas):
        from .utils.compute import host_f64

        with host_f64():
            coefs = joint_interp_coefs(beta0s, derivs_np, order)
            return eval_abs_poly(coefs, betas)

    def predict(states, betas):
        betas = jnp.atleast_1d(jnp.asarray(betas))
        # concrete call: fetch the (tiny) derivative stacks to host in one
        # go so the f64 solve/eval below is pure host work; under a trace
        # (streaming_jackknife vmaps predict) pass tracers through
        traced = any(
            isinstance(leaf, jax.core.Tracer)
            for leaf in jax.tree_util.tree_leaves((states, betas))
        )
        conv = (lambda d: d) if traced else np.asarray
        if not nrep:
            ds = conv(_derivs_all(tuple(states)))
            return _solve_eval(list(ds), betas)
        # mean + replicate legs in one program launch, one fetch per leg
        dm, dr = _derivs_both(
            tuple(s[0] for s in states), tuple(s[1] for s in states)
        )
        ds_mean, ds_rep = conv(dm), conv(dr)
        pred = _solve_eval(list(ds_mean), betas)
        # replicate leg: the (nrep,) batch axis of each state's replicate
        # accumulator rides through the derivative engine and the joint
        # solve's RHS batch dims — one solve for all replicates
        bpred = _solve_eval(list(ds_rep), betas)
        from .utils.compute import host_f64

        # bpred is host-f64; reduce it in the same context or the f64 std
        # request truncates noisily on TPU backends
        with host_f64():
            return pred, bpred.std(axis=1)

    return states0, update, predict


def streaming_jackknife(states, predict, *args):
    r"""Delete-one-block jackknife over retained streaming chunk states:
    prediction + standard error with NO sample retention.

    The streaming pipelines accumulate chunks into one state; keeping the
    per-chunk states instead (tiny — ``O(order * V)`` numbers each) admits
    an exact uncertainty estimate: every leave-one-chunk-out pooled state
    is built from prefix/suffix exact merges (``O(C)`` merges total, not
    ``O(C^2)``), ``predict`` is evaluated on each, and the block-jackknife
    variance ``(C-1)/C * sum_i (theta_i - theta_bar)^2`` is returned.  For
    time-correlated simulation streams the delete-a-block estimator is the
    statistically appropriate one (each chunk is a correlation block); the
    reference's uncertainty path is iid bootstrap over single samples
    (reference data.py:1285-1392).

    Parameters
    ----------
    states : sequence of per-chunk ``DataCentralMoments`` (same structure).
    predict : callable ``predict(state, *args) -> array`` (e.g. the
        ``predict`` returned by :func:`make_streaming_extrap_pipeline`).
        Must be jax-traceable: all LOO predictions run as ONE ``vmap``
        dispatch over the stacked states.
    *args : forwarded to ``predict``.

    Returns
    -------
    ``(pred, std_err)`` — ``pred`` from the all-chunks pooled state,
    ``std_err`` the jackknife standard error of ``pred``, same shape.
    """
    states = list(states)
    c = len(states)
    if c < 2:
        msg = f"jackknife needs >= 2 chunk states, got {c}"
        raise ValueError(msg)

    # prefix[i] = pool of states[:i]; suffix[i] = pool of states[i:]
    prefix = [None] * (c + 1)
    suffix = [None] * (c + 1)
    for i, s in enumerate(states):
        prefix[i + 1] = s if prefix[i] is None else prefix[i].merge(s)
    for i in range(c - 1, -1, -1):
        s = states[i]
        suffix[i] = s if suffix[i + 1] is None else s.merge(suffix[i + 1])

    full = prefix[c]
    loo = []
    for i in range(c):
        if prefix[i] is None:
            loo.append(suffix[i + 1])
        elif suffix[i + 1] is None:
            loo.append(prefix[i])
        else:
            loo.append(prefix[i].merge(suffix[i + 1]))
    # one dispatch for all C LOO predictions: the states are uniform
    # pytrees, so stack them and vmap `predict` (which must therefore be
    # traceable — the jitted predicts returned by the streaming pipeline
    # factories are) instead of paying C per-call dispatch overheads
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *loo)
    theta = jax.vmap(lambda s: predict(s, *args))(stacked)  # (C, ...)
    var = (c - 1) / c * ((theta - theta.mean(0)) ** 2).sum(0)
    return jnp.asarray(predict(full, *args)), jnp.sqrt(var)


def _u_central_moments_xla(uv, order: int):
    """Two-pass batched central u-moments (XLA fallback for the lnΠ
    pipeline off-accelerator): ``uv (*batch, R)`` → ``(uave (*batch,),
    du (order+1, *batch))`` with ``du[0]=1, du[1]=0``."""
    uave = uv.mean(-1)
    d = uv - uave[..., None]
    rows = [jnp.ones_like(uave), jnp.zeros_like(uave)]
    p = d * d
    for _ in range(2, order + 1):
        rows.append(p.mean(-1))
        p = p * d
    return uave, jnp.stack(rows)


def make_lnpi_pipeline(
    order: int,
    beta0: float,
    *,
    nrep: int = 0,
    mesh=None,
):
    r"""Build a jitted ``run(uv, lnpi0, mudotn, betas, seed=0)`` for
    macrostate-grid lnΠ temperature extrapolation (reference
    lnpi.py:372-438 workflow).

    One dispatch covers the whole grid: the batched u-moment Pallas kernel
    reduces every macrostate's energy stream at once (``uv (*grid, R)``,
    x_is_u), the series engine integrates ``(lnΠ)' = μ·N − <u>`` term by
    term, and Taylor evaluation lands ``lnΠ`` at each target β.

    ``lnpi0 (*grid,)`` is the reference-β distribution, ``mudotn (*grid,)``
    the per-macrostate ``μ·N`` coupling; returns ``(A, *grid)``.

    Parameters
    ----------
    nrep : if > 0, also return the bootstrap standard deviation of the
        extrapolated lnΠ — the same uncertainty path the flagship extrap
        pipeline has (the reference resamples lnΠ data along ``rec``,
        lnpi.py:258-286).  The frequency table is SHARED across the grid
        (replicates resample whole configurations).  On an accelerator the
        replicates come from the in-kernel Poisson bootstrap (no
        ``(nrep, R)`` table in HBM); on CPU/mesh from the freq-table path.
    mesh : optional ``jax.sharding.Mesh`` with a ``"rec"`` axis (and
        optionally ``"rep"``): the grid reduction and bootstrap run
        sharded over devices (``parallel/sharded.py`` batched variants);
        shard ``uv`` on its LAST (rec) axis.

    Returns ``(A, *grid)`` or ``(pred, std)`` with ``std (A, *grid)``.
    """
    if order < 1:
        msg = f"lnPi order must be >= 1, got {order}"
        raise ValueError(msg)
    on_accel = jax.default_backend() != "cpu"

    def _coefs(uave, du, lnpi0, mudotn):
        u_c = central_u_ave_coefs(uave, du, order - 1)
        return lnpi_coefs(u_c, lnpi0, mudotn, order)

    @jax.jit
    def _run(uv, lnpi0, mudotn, betas, seed):
        uv = jnp.asarray(uv)
        lnpi0 = jnp.asarray(lnpi0)
        mudotn = jnp.asarray(mudotn)
        betas = jnp.atleast_1d(jnp.asarray(betas))
        dalpha = betas - beta0

        if mesh is not None:
            from .parallel import reduce_central_umoments_batched_sharded

            uave, du = reduce_central_umoments_batched_sharded(uv, order, mesh)
        elif on_accel:
            from .ops.moments_pallas import reduce_central_umoments_batched_ad

            uave, du = reduce_central_umoments_batched_ad(uv, None, order)
        else:
            uave, du = _u_central_moments_xla(uv, order)
        pred = _poly_eval(_coefs(uave, du, lnpi0, mudotn), dalpha)
        if not nrep:
            return pred

        if mesh is not None:
            from .ops.resample import freq_from_indices, random_indices
            from .parallel import resample_central_umoments_batched_sharded

            r = uv.shape[-1]
            freq = freq_from_indices(
                random_indices(jax.random.key(seed), nrep, r), r
            )
            bu, bdu = resample_central_umoments_batched_sharded(
                uv, freq, order, mesh
            )
        elif on_accel:
            from .ops.moments_pallas import (
                resample_central_umoments_batched_poisson,
            )

            bu, bdu = resample_central_umoments_batched_poisson(
                uv, nrep, order, seed=seed
            )
        else:
            from .ops.resample import (
                freq_from_indices,
                random_indices,
                resample_central_umoments_batched,
            )

            r = uv.shape[-1]
            freq = freq_from_indices(
                random_indices(jax.random.key(seed), nrep, r), r
            )
            bu, bdu = resample_central_umoments_batched(uv, freq, order)

        # replicate axis rides as a leading batch axis of the coef engine
        bpred = _poly_eval(_coefs(bu, bdu, lnpi0[None], mudotn[None]), dalpha)
        std = bpred.std(axis=1)  # (A, *grid)
        return pred, std

    def run(uv, lnpi0, mudotn, betas, seed=0):
        return _run(uv, lnpi0, mudotn, betas, seed)

    return run


def _perturb_weights(uv, dalpha, weight, return_shift: bool = False):
    """Max-shift-stabilized unnormalized perturbation weights ``(A, R)``:
    ``exp(-dalpha_a * u_n + log w_n - max_n)``.  Zero sample weights drop
    exactly (``-inf`` log-mask — the bucket-padding seam).  Shared by the
    live pipeline and the AOT export tracer so the math cannot drift.
    ``return_shift=True`` also returns the per-target maxima ``(A,)``
    (diagnostic/bench seam; the production kernels consume the STREAMED
    ``e`` rows themselves — the in-VMEM rebuild was measured slower and
    dropped, see ``ops.moments_pallas._perturb_rows``)."""
    logw = -dalpha[:, None] * uv[None, :]  # (A, R)
    if weight is not None:
        w = jnp.asarray(weight, uv.dtype)
        logm = jnp.where(w > 0, jnp.log(jnp.where(w > 0, w, 1.0)), -jnp.inf)
        logw = logw + logm[None, :]
    shift = jax.lax.stop_gradient(jnp.max(logw, axis=1, keepdims=True))
    # All-masked row (every weight zero): shift is -inf and -inf - -inf = NaN.
    # Mirror the streaming accumulator's finite-mask so the weights collapse
    # to exact zeros instead (prediction then yields the 0/0 NaN convention
    # in one place, the normalization, rather than poisoning the matmul).
    shift = jnp.where(jnp.isfinite(shift), shift, 0.0)
    e = jnp.exp(logw - shift)
    return (e, shift[:, 0]) if return_shift else e


def _perturb_predict(e, xflat):
    """``<x>`` per target from stabilized weights.

    For small CONCRETE ``V`` this is a fused elementwise+reduce per value
    column, NOT a matmul: ``(A, R) @ (R, V)`` with tiny ``V`` is a
    degenerate MXU shape — the systolic array feeds K=R serially for a
    V-wide output, measured 54 ms at R=1e7 where the reduce form is
    sub-ms (round-5 PERTURB_DECOMP).  Large or symbolic ``V`` (the
    shape-polymorphic AOT export tracer) keeps the matmul."""
    v = xflat.shape[1]
    if isinstance(v, int) and 1 <= v <= 8:
        num = jnp.stack(
            [(e * xflat[:, k][None, :]).sum(axis=1) for k in range(v)],
            axis=1,
        )
    else:
        num = jnp.matmul(e, xflat, precision=jax.lax.Precision.HIGHEST)
    return num / e.sum(axis=1)[:, None]


def _perturb_boot(e, xflat, freq):
    """Replicate predictions ``(A, nrep, V)``: one einsum of Poisson
    counts against every target's weighted samples (numerator) and
    weights (denominator) — the freq-matmul bootstrap shape with the
    target axis riding as a batch dimension (symbolic-A-safe for the AOT
    export tracer; a Python loop over targets breaks shape-polymorphic
    export).  Measured equivalent to the earlier per-target vmap on chip
    (0.070 vs 0.065 s at R=1e7 x 128 x A=5 — XLA already amortized the
    frequency-table reads across targets)."""
    v = xflat.shape[1]
    # [x | 1] once, weighted per target: (A, R, V+1) — A stays a free
    # (possibly symbolic, for the AOT export tracer) batch dimension
    xe = jnp.concatenate([xflat, jnp.ones_like(xflat[:, :1])], axis=1)
    y = e[:, :, None] * xe[None]  # (A, R, V+1)
    s = jnp.einsum(
        "nr,arv->anv", freq, y, precision=jax.lax.Precision.HIGHEST
    )  # (A, nrep, V+1)
    return s[..., :v] / s[..., v:]


def make_perturb_pipeline(
    beta0: float,
    *,
    nrep: int = 0,
    mesh=None,
    weighted: bool = False,
    poisson: str = "device",
):
    r"""Build a jitted ``run(uv, xv, betas[, weight], seed=0)`` for
    exponential-reweighting perturbation (reference models.py:1009-1046
    ``PerturbModel`` workflow) — the zero-derivative serving path:

    .. math::

        \langle x\rangle_\beta = \frac{\langle x\, e^{-(\beta-\beta_0) u}
        \rangle_{\beta_0}}{\langle e^{-(\beta-\beta_0) u}\rangle_{\beta_0}}

    logsumexp-stabilized, evaluated for every target β in ONE dispatch
    (an ``(A, R) @ (R, V)`` matmul — MXU work).  With ``nrep`` the CI
    replicates push Poisson(1) resample counts through the same stabilized
    weights.  On an accelerator the bootstrap runs as a fused Pallas
    kernel: all targets' contribution rows ``e_a [x | 1]`` stack into ONE
    transposed MXU dot against a frequency tile SHARED across targets
    (the batch-grouped grid-kernel structure; VERDICT r4 item 1 — the old
    einsum re-read a materialized f32 table once per target).  On CPU (and
    under ``mesh=``) the same counts flow through the XLA einsum.

    Parameters
    ----------
    beta0 : reference state the samples were drawn at.
    nrep : if > 0 also return the bootstrap standard deviation.
    mesh : optional ``jax.sharding.Mesh`` with a ``"rec"`` axis: operands
        are placed sample-sharded and GSPMD turns the sample-axis
        reductions/matmuls into mesh psums (the
        ``parallel.sharded.mbar_solve_sharded`` pattern — no shard_map
        needed).
    weighted : adds a per-sample weight operand (zero weights drop
        samples exactly).
    poisson : ``"device"`` (default) draws frequencies inside the fused
        kernel from the hardware PRNG — zero table traffic, no threefry
        draw cost (the round-5 decomposition measured the
        ``poisson1_freq`` table draw alone above the whole consume), and
        the same draw-schedule convention as the flagship extrapolation
        pipelines (the flat moment kernel's ``_poisson_draw`` contract).
        ``"table"`` draws ONE ``poisson1_freq`` table from the call's
        seed instead (int8 in HBM), so every backend and the AOT
        artifacts see IDENTICAL counts at equal seed — the count-parity
        mode, at the cost of the threefry draw.  On CPU (no Pallas PRNG)
        and under ``mesh=`` both modes run the table/einsum path.

    Returns
    -------
    ``run(uv, xv, betas, seed=0)`` mapping ``uv (R,)``, ``xv (R, *val)``,
    ``betas (A,)`` → ``pred (A, *val)`` or ``(pred, std)``; with
    ``weighted`` the call is ``run(uv, xv, betas, weight, seed=0)``.

    Examples
    --------
    >>> import numpy as np
    >>> run = make_perturb_pipeline(1.0)
    >>> uv = np.array([0.5, 1.0, 1.5, 2.0])
    >>> pred = run(uv, 3.0 * uv, np.array([1.0]))  # at beta0: plain mean
    >>> np.testing.assert_allclose(np.asarray(pred)[0], np.mean(3.0 * uv))
    """
    if poisson not in ("table", "device"):
        msg = f"poisson must be 'table' or 'device', got {poisson!r}"
        raise ValueError(msg)

    @jax.jit
    def _run(uv, xv, betas, weight, seed):
        uv = jnp.asarray(uv)
        xv = jnp.asarray(xv)
        betas_a = jnp.atleast_1d(jnp.asarray(betas))
        val_shape = xv.shape[1:]
        r = uv.shape[0]
        xflat = xv.reshape(r, -1)
        v = xflat.shape[1]
        dalpha = (betas_a - beta0).astype(uv.dtype)
        e = _perturb_weights(uv, dalpha, weight)
        pred = _perturb_predict(e, xflat).reshape(betas_a.shape + val_shape)
        if not nrep:
            return pred
        # kernel path caps the stacked contribution rows at 512 (VMEM
        # block budget); enormous target batches fall back to the einsum
        on_accel = (
            jax.default_backend() != "cpu"
            and mesh is None
            and betas_a.shape[0] * (v + 1) <= 512
        )
        if on_accel:
            from .ops.moments_pallas import (
                resample_perturb_freq,
                resample_perturb_poisson,
            )

            # the kernels STREAM the same stabilized e rows the predict
            # path uses (weights/shifts/zero-masks pre-folded)
            if poisson == "device":
                s = resample_perturb_poisson(e, xflat, nrep, seed=seed)
            else:
                freq = poisson1_freq(
                    jax.random.key(seed), (nrep, r), dtype=jnp.int8
                )
                s = resample_perturb_freq(e, xflat, freq)
            bpred = s[..., :v] / s[..., v:]  # (A, nrep, V)
        else:
            freq = poisson1_freq(
                jax.random.key(seed), (nrep, r), dtype=uv.dtype
            )
            bpred = _perturb_boot(e, xflat, freq)  # (A, nrep, V)
        std = bpred.std(axis=1).reshape(betas_a.shape + val_shape)
        return pred, std

    def _prep(uv, xv, weight):
        if mesh is None:
            return uv, xv, weight
        from .parallel import shard_rec

        uv = shard_rec(jnp.asarray(uv), mesh)
        xv = shard_rec(jnp.asarray(xv), mesh)
        if weight is not None:
            weight = shard_rec(jnp.asarray(weight), mesh)
        return uv, xv, weight

    if weighted:

        def run(uv, xv, betas, weight, seed=0):
            uv, xv, weight = _prep(uv, xv, weight)
            return _run(uv, xv, betas, weight, seed)

    else:

        def run(uv, xv, betas, seed=0):
            uv, xv, _ = _prep(uv, xv, None)
            return _run(uv, xv, betas, None, seed)

    return run


def make_volume_pipeline(
    volume0: float,
    *,
    ndim: int = 3,
    nrep: int = 0,
    mesh=None,
    weighted: bool = False,
    bf16: bool = False,
):
    r"""Build a jitted ``run(wv, xv, dxdqv, volumes, seed=0)`` for first-order
    volume extrapolation of ``<x>`` (reference volume.py:137-209 workflow) —
    the volume-ensemble counterpart of :func:`make_extrap_pipeline`.

    The volume derivative is a pure first-moment expression
    (reference volume.py:39-80):

    .. math::

        \frac{d\langle x\rangle}{dV}
          = \frac{\mathrm{cov}(x, W) + \langle dxdq \rangle}{V_0\, d}

    with ``W = beta * virial`` and ``dxdq = sum_i dx/dq_i q_i``, since
    ``-<x><W> + <xW> = cov(x, W)`` is exactly the order-1 central comoment
    the fused kernel emits.  The pipeline therefore packs ``xv`` and
    ``dxdqv`` as value columns of ONE order-1 fused reduction (one pass
    over all three streams) and assembles the Taylor step; with ``nrep``
    the in-kernel Poisson bootstrap resamples whole configurations — the
    ``(x, W, dxdq)`` rows stay paired, matching the eager
    ``VolumeDataCallback.resample`` index semantics.

    Parameters
    ----------
    volume0 : reference volume the samples were drawn at.
    ndim : spatial dimensionality ``d`` in the ``V * d`` denominator.
    nrep, mesh, weighted, bf16 : as in :func:`make_extrap_pipeline`.

    Returns
    -------
    ``run(wv, xv, dxdqv, volumes, seed=0)`` where ``wv (R,)`` is the
    temperature-scaled virial ``beta * virial``, ``xv (R, *val)`` the
    observable samples, ``dxdqv (R, *val)`` the ``sum_i dx/dq_i q_i``
    samples, ``volumes (A,)`` → ``pred (A, *val)`` or ``(pred, std)``.
    With ``weighted`` the call is ``run(wv, xv, dxdqv, volumes, weight,
    seed=0)``.

    Examples
    --------
    >>> import numpy as np
    >>> run = make_volume_pipeline(1.0, ndim=1)
    >>> wv = np.array([1.0, 2.0, 3.0, 4.0])
    >>> xv = 2.0 * wv
    >>> pred = run(wv, xv, np.zeros(4), np.array([1.0]))  # at V0: <x>
    >>> float(np.asarray(pred)[0])
    5.0
    """
    on_accel = jax.default_backend() != "cpu"
    use_bf16 = bf16 and on_accel and mesh is None
    order = 1  # higher orders would need force derivatives (volume.py:29-49)
    v0d = float(volume0) * float(ndim)

    @jax.jit
    def _run(wv, xv, dxdqv, volumes, weight, seed):
        wv = jnp.asarray(wv)
        xv = jnp.asarray(xv)
        dxdqv = jnp.asarray(dxdqv)
        if xv.shape != dxdqv.shape:
            msg = f"xv {xv.shape} and dxdqv {dxdqv.shape} must match"
            raise ValueError(msg)
        if use_bf16:
            wv = wv.astype(jnp.bfloat16)
            xv = xv.astype(jnp.bfloat16)
            dxdqv = dxdqv.astype(jnp.bfloat16)
        val_shape = xv.shape[1:]
        r = wv.shape[0]
        xflat = xv.reshape(r, -1)
        v = xflat.shape[1]
        packed = jnp.concatenate([xflat, dxdqv.reshape(r, -1)], axis=1)
        volumes_a = jnp.atleast_1d(jnp.asarray(volumes))
        dalpha = volumes_a - volume0

        def _predict(xave, cov1, batch_ndim: int):
            # xave (*b, 2V): [x means | dxdq means]; cov1 (*b, V) = cov(x, W)
            deriv = (cov1 + xave[..., v:]) / v0d
            da = dalpha.reshape((-1,) + (1,) * (batch_ndim + 1))
            return xave[None, ..., :v] + da * deriv[None]

        if mesh is not None:
            from .parallel import reduce_central_comoments_sharded

            xave, _uave, _du, dxdu = reduce_central_comoments_sharded(
                wv, packed, order, mesh, weight=weight
            )
        else:
            xave, _uave, _du, dxdu = dispatch.reduce_central(
                wv, packed, order, weight=weight
            )
        pred = _predict(xave, dxdu[1, :v], 0)
        pred = pred.reshape(volumes_a.shape + val_shape)
        if not nrep:
            return pred

        if mesh is not None:
            from .ops.resample import freq_from_indices, random_indices
            from .parallel import resample_central_comoments_sharded

            freq = freq_from_indices(
                random_indices(jax.random.key(seed), nrep, r), r
            )
            bx, _bu, _bdu, bdxdu = resample_central_comoments_sharded(
                wv, packed, freq, order, mesh, weight=weight
            )
        elif on_accel:
            from .ops.moments_pallas import resample_central_comoments_poisson

            bx, _bu, _bdu, bdxdu = resample_central_comoments_poisson(
                wv, packed, nrep, order, weight=weight, seed=seed
            )
        else:
            from .ops.resample import (
                freq_from_indices,
                random_indices,
                resample_central_comoments,
            )

            freq = freq_from_indices(
                random_indices(jax.random.key(seed), nrep, r), r
            )
            bx, _bu, _bdu, bdxdu = resample_central_comoments(
                wv, packed, freq, order, weight=weight
            )

        # bx (nrep, 2V), bdxdu (2, nrep, 2V) -> bpred (A, nrep, V)
        bpred = _predict(bx, bdxdu[1, :, :v], 1)
        std = bpred.std(axis=1).reshape(volumes_a.shape + val_shape)
        return pred, std

    if weighted:

        def run(wv, xv, dxdqv, volumes, weight, seed=0):
            return _run(wv, xv, dxdqv, volumes, weight, seed)

    else:

        def run(wv, xv, dxdqv, volumes, seed=0):
            return _run(wv, xv, dxdqv, volumes, None, seed)

    return run


def make_gpr_pipeline(
    states,
    *,
    log_scale: bool = False,
    base_kwargs=None,
    start_params=None,
    orders=(0,),
    bucket: int = 64,
):
    """Train a derivative-informed GPR on extrapolation states and return
    ``(gpr, predict)`` — a compile-once posterior serving closure.

    Serving counterpart of the extrap/lnΠ pipelines for the GPR model
    family (no reference analogue — the reference workflow is eager
    ``create_GPR`` + ``predict_f`` per grid, active_utils.py:872-975).
    The GP linear algebra is pinned to host-CPU f64 (TPU has no f64
    Cholesky; see ``gpr_active.gp_models._compute_ctx``), so the serving
    concern here is COMPILE reuse, not dispatch fusion: ``predict_f``
    compiles one XLA program per (derivative-order set, grid shape), and a
    stream of ragged query grids would retrace every call.  ``predict``
    therefore pads each query to the next multiple of ``bucket`` (repeating
    the last point) and slices the pad back off — any query size reuses at
    most a handful of cached programs.

    Parameters
    ----------
    states : sequence of ``ExtrapModel`` (or callables returning
        ``(x, y, cov)``) — the training states, as for ``create_GPR``.
    log_scale : train on log10-transformed locations/derivatives
        (``active_utils.input_GP_from_state``); ``predict`` applies the
        same location transform, and its outputs stay in the transformed
        y-space (invert with the delta method if original units are
        needed).
    base_kwargs, start_params : forwarded to ``create_GPR``.
    orders : derivative orders ``predict`` may be asked for (static set;
        order 0 = the observable itself).
    bucket : query-grid size quantum (compile granularity).

    Returns
    -------
    ``(gpr, predict)`` with ``predict(alphas, order=0) -> (mean, var)``,
    each ``(len(alphas), out_dim)`` f64 numpy arrays.
    """
    import numpy as np

    from .gpr_active.active_utils import create_GPR

    orders = tuple(int(o) for o in orders)
    gpr = create_GPR(
        list(states),
        log_scale=log_scale,
        start_params=start_params,
        base_kwargs=base_kwargs,
    )

    def predict(alphas, order: int = 0):
        if order not in orders:
            msg = f"{order=} not in the pipeline's static {orders=}"
            raise ValueError(msg)
        alphas = np.atleast_1d(np.asarray(alphas, dtype=np.float64))
        n = alphas.shape[0]
        if n == 0:
            empty = np.zeros((0, int(gpr.out_dim)), dtype=np.float64)
            return empty, empty.copy()
        n_pad = max(((n + bucket - 1) // bucket) * bucket, bucket)
        locs = np.full(n_pad, alphas[-1], dtype=np.float64)
        locs[:n] = alphas
        if log_scale:
            locs = np.log10(locs)
        x_new = np.column_stack([locs, np.full(n_pad, order, np.float64)])
        mean, var = gpr.predict_f(x_new)
        return np.asarray(mean)[:n], np.asarray(var)[:n]

    return gpr, predict


def normalize_buckets(buckets) -> tuple:
    """Sorted bucket table; default powers of two ``2^12 .. 2^27``."""
    return (
        tuple(1 << p for p in range(12, 28))
        if buckets is None
        else tuple(sorted(int(b) for b in buckets))
    )


def bucket_pad(uv, xv, weight, buckets):
    """Zero-weight bucket padding shared by the bucketed serving runners
    (:func:`make_bucketed_extrap_runner`,
    :func:`~thermoextrap_tpu.serving_export.bucketed_runner`).

    Pads ``(uv, xv, weight)`` up to the smallest bucket >= R (unchanged if
    R exceeds the largest bucket); ``xv=None`` passes through (the
    ``x_is_u`` runner has no observable stream) and ``xv`` may be a
    *tuple* of value streams padded together in one pass (the volume
    runner's ``(xv, dxdqv)`` pair).  Exact: padded samples
    carry zero
    weight, and the pad value replicates the last sample so bf16 streams
    stay in distribution.  Weights keep their own floating dtype (a silent
    f32 downcast of user f64 weights would break the padded == unpadded
    exactness); integer weights are promoted to f32.
    """
    multi = isinstance(xv, tuple)
    uv = np.asarray(uv)
    if multi:
        if not xv:
            # an empty tuple would silently come back as xv=None and
            # TypeError at the caller's unpack — reject it loudly instead
            msg = "bucket_pad: a tuple of value streams may not be empty"
            raise ValueError(msg)
        if any(x is None for x in xv):
            msg = "bucket_pad: a tuple of value streams may not contain None"
            raise ValueError(msg)
        xvs = tuple(np.asarray(x) for x in xv)
    else:
        xvs = () if xv is None else (np.asarray(xv),)
    xv = None if not xvs else (xvs if multi else xvs[0])
    r = uv.shape[0]
    if r == 0:
        msg = "serve() needs at least one sample"
        raise ValueError(msg)
    w = (
        np.ones(r, dtype=np.promote_types(uv.dtype, np.float32))
        if weight is None
        else np.asarray(weight)
    )
    if w.dtype.kind != "f":
        w = w.astype(np.float32)
    rp = next((b for b in buckets if b >= r), r)
    if rp == r:
        return uv, xv, w
    pad = rp - r

    def _pad_vals(x):
        tail = np.broadcast_to(x[-1], (pad, *x.shape[1:])).astype(x.dtype)
        return np.concatenate([x, tail])

    uvp = np.concatenate([uv, np.full(pad, uv[-1], dtype=uv.dtype)])
    xvp = (
        None
        if xv is None
        else tuple(_pad_vals(x) for x in xvs)
        if multi
        else _pad_vals(xv)
    )
    wp = np.concatenate([w, np.zeros(pad, dtype=w.dtype)])
    return uvp, xvp, wp


def make_bucketed_extrap_runner(
    order: int,
    beta0: float,
    *,
    buckets=None,
    minus_log: bool = False,
    xalpha: bool = False,
    x_is_u: bool = False,
    nrep: int = 0,
    bf16: bool = False,
):
    r"""Serving wrapper around :func:`make_extrap_pipeline` that accepts ANY
    sample count without recompiling.

    XLA compiles one program per static shape, so serving traffic with
    varying ``R`` would recompile per request (minutes cold on the remote
    TPU compile service).  This runner pads every request up to the
    smallest configured bucket with **zero-weight** samples — exact for the
    weighted reduction (a zero-weight sample contributes nothing), so the
    mean prediction is bit-equal to the unpadded run — and dispatches to
    the per-bucket compiled program.  With ``nrep``, the bootstrap over the
    padded stream is the Poissonized bootstrap (each real sample's
    replicate count stays ~Poisson(1); padded samples carry zero weight),
    the same family as the on-accelerator in-kernel Poisson path.

    Parameters
    ----------
    buckets : increasing sample-count buckets; defaults to powers of two
        ``2^12 .. 2^27``.  Requests above the largest bucket fall back to
        exact-shape compilation (one-off).
    order, beta0, minus_log, nrep, bf16 : as in :func:`make_extrap_pipeline`.

    Returns
    -------
    ``serve(uv, xv, betas, weight=None, seed=0)``; also exposes
    ``serve.warmup(val_shape=(1,), n_betas=1, max_bucket=None)`` to
    precompile bucket programs ahead of traffic (pair with
    :func:`utils.compile_cache.enable_compilation_cache` to persist them).

    Examples
    --------
    >>> import numpy as np
    >>> serve = make_bucketed_extrap_runner(2, 1.0, buckets=(8, 16))
    >>> uv = np.array([1.0, 2.0, 3.0, 4.0, 5.0])   # R=5 -> bucket 8
    >>> pred = serve(uv, 2.0 * uv[:, None], np.array([1.0]))
    >>> float(np.asarray(pred)[0, 0])
    6.0
    """
    run = make_extrap_pipeline(
        order,
        beta0,
        minus_log=minus_log,
        xalpha=xalpha,
        x_is_u=x_is_u,
        nrep=nrep,
        weighted=True,
        bf16=bf16,
    )
    buckets = normalize_buckets(buckets)

    if x_is_u:

        def serve(uv, betas, weight=None, seed=0):
            uvp, _xvp, wp = bucket_pad(uv, None, weight, buckets)
            return run(uvp, betas, wp, seed)

    else:

        def serve(uv, xv, betas, weight=None, seed=0):
            uvp, xvp, wp = bucket_pad(uv, xv, weight, buckets)
            return run(uvp, xvp, betas, wp, seed)

    def warmup(
        val_shape=(1,),
        n_betas: int = 1,
        max_bucket: int | None = None,
        dtype=np.float32,
    ):
        """Precompile the bucket programs with dummy traffic.

        ``dtype`` must match the real traffic's sample dtype — compiled
        programs are dtype-keyed, so f64 warmup would not serve f32
        requests (matters in x64-enabled processes).
        """
        for b in buckets:
            if max_bucket is not None and b > max_bucket:
                break
            uv = np.linspace(0.5, 1.5, b, dtype=dtype)
            if x_is_u:
                out = serve(uv, np.full(n_betas, beta0))
            else:
                xv_shape = (
                    (b, order + 1, *val_shape) if xalpha else (b, *val_shape)
                )
                xv = np.ones(xv_shape, dtype=dtype)
                out = serve(uv, xv, np.full(n_betas, beta0))
            jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)

    serve.warmup = warmup
    serve.buckets = buckets
    return serve
