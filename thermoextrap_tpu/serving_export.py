r"""AOT-exported serving artifacts (``jax.export``): trace once, deploy anywhere.

TPU-native addition (no reference analogue — the reference's deployment
story is "import the package and re-trace", models.py:487-576).  A serving
pipeline is traced and lowered ONCE — optionally *shape-polymorphic* in the
sample count ``R`` and the query count ``A`` — serialized to a portable
StableHLO artifact, and reloaded in any process without re-tracing any
Python.  This kills the two cold-start costs a production deployment pays
per process:

- **Python tracing/staging** of the pipeline (seconds): gone — the artifact
  IS the traced program; loading it imports no model code and traces
  nothing.
- **Re-exporting per shape**: gone — the program is symbolic in ``R``/``A``,
  so one artifact covers every input size.  Note the backend still
  compiles once per *concrete* shape at call time (cached in-process;
  measured ~2 s/shape CPU vs ~2 ms artifact load — EXPORT_SERVING.json,
  benches/bench_export.py): bound the compile count
  with :func:`bucketed_runner` (zero-weight padding to size buckets) and
  persist the compiles across processes with
  :func:`~thermoextrap_tpu.utils.enable_compilation_cache`.

Artifacts are multi-platform by default (``cpu`` + ``tpu``): the same file
serves a TPU fleet and a CPU canary.  The exported programs use the pure
XLA compute paths (``ops/moments.py`` / ``ops/resample.py``) rather than
hand-written Pallas kernels, so one artifact lowers on every requested
platform; bootstrap replicates use Poisson(1) frequency tables (the same
convention as the streaming pipelines — a valid bootstrap whose CI
converges to the multinomial one, pipeline.py streaming notes).

The artifact families: batch β-extrap (:func:`export_extrap_pipeline`),
perturbation reweighting (:func:`export_perturb_pipeline`), first-order
volume extrapolation (:func:`export_volume_pipeline`),
macrostate-grid lnΠ (:func:`export_lnpi_pipeline`), frozen GPR posterior
predictors (:func:`export_gpr_predictor` — polymorphic in the query count
``M``), MBAR solve+reweighting (:func:`export_mbar_reweighter` — the
Newton/self-consistent hybrid inside the artifact), and STREAMING bundles (:func:`export_streaming_extrap_pipeline` /
:func:`export_streaming_lnpi_pipeline` — ``update`` polymorphic in the
chunk length, ``predict``, and the initial accumulator state in one file;
the state crosses the boundary as an opaque array tuple).

File format: a one-line JSON header (family + static config, for
introspection and argument checking) followed by the ``jax.export``
serialization — or, for streaming bundles, the two serialized programs
plus an ``npz`` of the initial state, with byte offsets in the header.

Examples
--------
>>> import numpy as np
>>> art = export_extrap_pipeline(order=2, beta0=1.0)
>>> uv = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
>>> xv = np.array([[2.0], [4.0], [6.0], [8.0]], np.float32)
>>> pred = art(uv, xv, np.array([1.0], np.float32))
>>> float(np.asarray(pred)[0, 0])
5.0
"""

from __future__ import annotations

import json

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .models.derivatives import (
    central_u_ave_coefs,
    central_x_ave_coefs,
    lnpi_coefs,
)
from .models.extrap import _poly_eval
from .ops.moments import reduce_central_comoments
from .ops.resample import poisson1_freq, resample_central_comoments
from .ops.series import series_neg_log

__all__ = [
    "ExportedPipeline",
    "StreamingExportedPipeline",
    "bucketed_runner",
    "export_extrap_pipeline",
    "export_gpr_predictor",
    "export_lnpi_pipeline",
    "export_mbar_reweighter",
    "export_perturb_pipeline",
    "export_streaming_extrap_pipeline",
    "export_streaming_lnpi_pipeline",
    "export_streaming_perturb_pipeline",
    "export_streaming_volume_pipeline",
    "export_volume_pipeline",
    "describe_artifact",
    "load_exported",
    "save_exported",
]

_MAGIC = b"THEXTPU-EXPORT-1"
_MAGIC_BUNDLE = b"THEXTPU-BUNDLE-1"


def _dtype_by_name(name: str) -> np.dtype:
    """Resolve a dtype name, including the ml_dtypes ones numpy doesn't
    know by string (``bfloat16`` & friends)."""
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


def _extrap_fn(order: int, beta0: float, minus_log: bool, nrep: int,
               weighted: bool, xalpha: bool = False, x_is_u: bool = False):
    """Pure-XLA extrapolation step (export-safe: no Pallas, no mesh).

    Mirrors the CPU branch of :func:`~thermoextrap_tpu.pipeline.
    make_extrap_pipeline` with Poisson(1) bootstrap frequencies.  With
    ``xalpha`` the flat value width packs (order+1 β-derivative columns)
    × (vv observable values), exactly as in the pipeline.
    """

    from .pipeline import _xalpha_boot_coefs, _xalpha_mean_coefs

    def _post(c):
        return series_neg_log(c) if minus_log else c

    def _coefs(xave, du, dxdu):
        if xalpha:
            c = _xalpha_mean_coefs(xave, du, dxdu, order)
        else:
            c = central_x_ave_coefs(xave, du, dxdu, order)
        return _post(c)

    def _boot_coefs(bx, bdu, bdxdu):
        if xalpha:
            c = _xalpha_boot_coefs(bx, bdu, bdxdu, nrep, order)
        else:
            c = central_x_ave_coefs(bx, bdu, bdxdu, order)
        return _post(c)

    def fn(uv, xv, betas, weight, seed):
        dalpha = betas - jnp.asarray(beta0, betas.dtype)
        xave, _uave, du, dxdu = reduce_central_comoments(
            uv, xv, order, weight=weight
        )
        pred = _poly_eval(_coefs(xave, du[:, None], dxdu), dalpha)
        if not nrep:
            return pred
        freq = poisson1_freq(
            jax.random.key(seed), (nrep, uv.shape[0]), dtype=jnp.int32
        )
        bx, _bu, bdu, bdxdu = resample_central_comoments(
            uv, xv, freq, order, weight=weight
        )
        bpred = _poly_eval(_boot_coefs(bx, bdu[:, :, None], bdxdu), dalpha)
        return pred, bpred.std(axis=1)

    def fn_u(uv, betas, weight, seed):
        # <u>(β) from u-moments only (x_is_u): central_u_ave_coefs builds
        # in the dxdu = du[n+1] shift; du_full has order+2 entries
        from .ops.resample import resample_central_umoments_batched

        dalpha = betas - jnp.asarray(beta0, betas.dtype)
        uave, _u, du_m, dxdu_m = reduce_central_comoments(
            uv, uv, order, weight=weight, val_ndim=0
        )
        du_full = jnp.concatenate([du_m, dxdu_m[-1:]], axis=0)
        pred = _poly_eval(
            _post(central_u_ave_coefs(uave, du_full, order)), dalpha
        )
        if not nrep:
            return pred
        freq = poisson1_freq(
            jax.random.key(seed), (nrep, uv.shape[0]), dtype=jnp.int32
        )
        bu, bdu_full = resample_central_umoments_batched(
            uv[None], freq, order + 1, weight=weight
        )
        bcoefs = _post(
            central_u_ave_coefs(bu[:, 0], bdu_full[..., 0], order)
        )
        std = _poly_eval(bcoefs, dalpha).std(axis=1)
        return pred, std

    if x_is_u:
        if weighted:
            return fn_u
        return lambda uv, betas, seed: fn_u(uv, betas, None, seed)
    if weighted:
        return fn
    return lambda uv, xv, betas, seed: fn(uv, xv, betas, None, seed)


def _lnpi_fn(order: int, beta0: float, nrep: int):
    """Pure-XLA lnΠ grid step (flat grid axis ``B``; loader reshapes)."""
    from .ops.resample import resample_central_umoments_batched
    from .pipeline import _u_central_moments_xla

    def _coefs(uave, du, lnpi0, mudotn):
        u_c = central_u_ave_coefs(uave, du, order - 1)
        return lnpi_coefs(u_c, lnpi0, mudotn, order)

    def fn(uv, lnpi0, mudotn, betas, seed):
        dalpha = betas - jnp.asarray(beta0, betas.dtype)
        uave, du = _u_central_moments_xla(uv, order)
        pred = _poly_eval(_coefs(uave, du, lnpi0, mudotn), dalpha)
        if not nrep:
            return pred
        freq = poisson1_freq(
            jax.random.key(seed), (nrep, uv.shape[-1]), dtype=jnp.int32
        )
        bu, bdu = resample_central_umoments_batched(uv, freq, order)
        bpred = _poly_eval(_coefs(bu, bdu, lnpi0[None], mudotn[None]), dalpha)
        return pred, bpred.std(axis=1)

    return fn


def _volume_fn(volume0: float, ndim: int, nrep: int, weighted: bool):
    """Pure-XLA first-order volume extrapolation step (export-safe).

    Mirrors :func:`~thermoextrap_tpu.pipeline.make_volume_pipeline`:
    ``d<x>/dV = (cov(x, W) + <dxdq>) / (V0 * d)`` from one order-1 central
    comoment reduction over the ``[x | dxdq]``-packed value columns, with
    Poisson(1) bootstrap frequencies for the CI replicates.
    """
    v0d = float(volume0) * float(ndim)

    def fn(wv, xv, dxdqv, volumes, weight, seed):
        r = wv.shape[0]
        v = xv.shape[1]
        packed = jnp.concatenate([xv, dxdqv], axis=1)
        dalpha = volumes - jnp.asarray(volume0, volumes.dtype)

        def _predict(xave, cov1, batch_ndim: int):
            deriv = (cov1 + xave[..., v:]) / v0d
            da = dalpha.reshape((-1,) + (1,) * (batch_ndim + 1))
            return xave[None, ..., :v] + da * deriv[None]

        xave, _uave, _du, dxdu = reduce_central_comoments(
            wv, packed, 1, weight=weight
        )
        pred = _predict(xave, dxdu[1, :v], 0)
        if not nrep:
            return pred
        freq = poisson1_freq(jax.random.key(seed), (nrep, r), dtype=jnp.int32)
        bx, _bu, _bdu, bdxdu = resample_central_comoments(
            wv, packed, freq, 1, weight=weight
        )
        bpred = _predict(bx, bdxdu[1, :, :v], 1)
        return pred, bpred.std(axis=1)

    if weighted:
        return fn
    return lambda wv, xv, dxdqv, volumes, seed: fn(
        wv, xv, dxdqv, volumes, None, seed
    )


def _perturb_fn(beta0: float, nrep: int, weighted: bool):
    """Pure-XLA exponential-reweighting perturbation step (export-safe).

    Mirrors :func:`~thermoextrap_tpu.pipeline.make_perturb_pipeline` via
    the SAME shared weight/predict/bootstrap helpers, with Poisson(1)
    frequency tables for the CI replicates.
    """
    from .pipeline import _perturb_boot, _perturb_predict, _perturb_weights

    def fn(uv, xv, betas, weight, seed):
        dalpha = betas - jnp.asarray(beta0, betas.dtype)
        e = _perturb_weights(uv, dalpha, weight)
        pred = _perturb_predict(e, xv)
        if not nrep:
            return pred
        freq = poisson1_freq(
            jax.random.key(seed), (nrep, uv.shape[0]), dtype=uv.dtype
        )
        bpred = _perturb_boot(e, xv, freq)
        return pred, bpred.std(axis=1)

    if weighted:
        return fn
    return lambda uv, xv, betas, seed: fn(uv, xv, betas, None, seed)


def _mbar_fn(tol, max_iter: int, method: str, chunk: int):
    """Pure-XLA MBAR solve + α-family reweighting, one program.

    ``alphas`` arrives pre-padded to a multiple of ``chunk`` (the caller
    wrapper pads with the last α and slices the output) so the chunked
    scan's reshape is provable under shape polymorphism.
    """
    from .models.mbar import mbar_expectations_alphas, mbar_solve_info

    def fn(u_kn, n_k, alphas, u_base, x_n):
        f_k, _it, res = mbar_solve_info(
            u_kn, n_k, tol=tol, max_iter=max_iter, method=method
        )
        out = mbar_expectations_alphas(
            u_kn, n_k, f_k, alphas, u_base, x_n, chunk=chunk
        )
        return f_k, res, out

    return fn


class ExportedPipeline:
    """A (re)loaded serving artifact: ``meta`` + a callable program.

    ``meta`` carries the static config (family, order, beta0, nrep, ...);
    calling the object runs the exported program on the default backend.
    Inputs are coerced to the exported dtypes; ``seed`` and (for the
    weighted extrap family) ``weight`` get defaults.
    """

    def __init__(self, exported: jax_export.Exported, meta: dict):
        self._exported = exported
        self.meta = dict(meta)

    @property
    def platforms(self) -> tuple[str, ...]:
        return tuple(self._exported.platforms)

    def serialize(self) -> bytes:
        header = json.dumps(self.meta, sort_keys=True).encode()
        return _MAGIC + b"\n" + header + b"\n" + self._exported.serialize()

    def save(self, path) -> None:
        with open(path, "wb") as f:
            f.write(self.serialize())

    # -- calling -----------------------------------------------------------
    def _dtype(self):
        return jnp.dtype(self.meta["dtype"])

    def __call__(self, *args, seed: int = 0, weight=None):
        m = self.meta
        dt = self._dtype()
        if weight is not None and not (
            m["family"] in ("extrap", "perturb", "volume") and m.get("weighted")
        ):
            msg = (
                "this artifact takes no weight operand (export with "
                "weighted=True to serve per-sample weights); refusing to "
                "silently ignore weight="
            )
            raise ValueError(msg)
        if m["family"] == "extrap":
            if m.get("x_is_u"):
                uv, betas = args
                uv = jnp.asarray(uv, dt)
                betas = jnp.atleast_1d(jnp.asarray(betas, dt))
                call = [uv, betas]
                if m["weighted"]:
                    if weight is None:
                        msg = (
                            "this artifact was exported weighted=True; "
                            "pass weight="
                        )
                        raise ValueError(msg)
                    call.append(jnp.asarray(weight, dt))
                call.append(jnp.asarray(seed, jnp.int32))
                return self._exported.call(*call)
            uv, xv, betas = args
            uv = jnp.asarray(uv, dt)
            xv = jnp.asarray(xv, dt)
            val_shape = None
            if m.get("xalpha"):
                nd = m["order"] + 1
                if xv.ndim < 2 or xv.shape[1] != nd:
                    msg = (
                        f"xalpha artifact: xv needs a deriv axis of size "
                        f"order+1={nd} after the sample axis, got {xv.shape}"
                    )
                    raise ValueError(msg)
                val_shape = xv.shape[2:]
                xv = xv.reshape(xv.shape[0], -1)
            elif xv.ndim == 1:
                xv = xv[:, None]
            betas = jnp.atleast_1d(jnp.asarray(betas, dt))
            call = [uv, xv, betas]
            if m["weighted"]:
                if weight is None:
                    msg = "this artifact was exported weighted=True; pass weight="
                    raise ValueError(msg)
                call.append(jnp.asarray(weight, dt))
            call.append(jnp.asarray(seed, jnp.int32))
            out = self._exported.call(*call)
            if val_shape is not None:
                reshape = lambda a: a.reshape(a.shape[:1] + val_shape)  # noqa: E731
                out = (
                    (reshape(out[0]), reshape(out[1]))
                    if m["nrep"]
                    else reshape(out)
                )
            return out
        if m["family"] == "perturb":
            uv, xv, betas = args
            uv = jnp.asarray(uv, dt)
            xv = jnp.asarray(xv, dt)
            val_shape = xv.shape[1:]
            xv = xv.reshape(xv.shape[0], -1) if xv.ndim != 1 else xv[:, None]
            betas = jnp.atleast_1d(jnp.asarray(betas, dt))
            call = [uv, xv, betas]
            if m["weighted"]:
                if weight is None:
                    msg = "this artifact was exported weighted=True; pass weight="
                    raise ValueError(msg)
                call.append(jnp.asarray(weight, dt))
            call.append(jnp.asarray(seed, jnp.int32))
            out = self._exported.call(*call)
            reshape = lambda a: a.reshape(a.shape[:1] + val_shape)  # noqa: E731
            if m["nrep"]:
                return reshape(out[0]), reshape(out[1])
            return reshape(out)
        if m["family"] == "volume":
            wv, xv, dxdqv, volumes = args
            wv = jnp.asarray(wv, dt)
            xv = jnp.asarray(xv, dt)
            dxdqv = jnp.asarray(dxdqv, dt)
            if xv.shape != dxdqv.shape:
                msg = f"xv {xv.shape} and dxdqv {dxdqv.shape} must match"
                raise ValueError(msg)
            val_shape = xv.shape[1:]
            xv = xv.reshape(xv.shape[0], -1) if xv.ndim != 1 else xv[:, None]
            dxdqv = (
                dxdqv.reshape(dxdqv.shape[0], -1)
                if dxdqv.ndim != 1
                else dxdqv[:, None]
            )
            volumes = jnp.atleast_1d(jnp.asarray(volumes, dt))
            call = [wv, xv, dxdqv, volumes]
            if m["weighted"]:
                if weight is None:
                    msg = "this artifact was exported weighted=True; pass weight="
                    raise ValueError(msg)
                call.append(jnp.asarray(weight, dt))
            call.append(jnp.asarray(seed, jnp.int32))
            out = self._exported.call(*call)
            reshape = lambda a: a.reshape(a.shape[:1] + val_shape)  # noqa: E731
            if m["nrep"]:
                return reshape(out[0]), reshape(out[1])
            return reshape(out)
        if m["family"] == "lnpi":
            uv, lnpi0, mudotn, betas = args
            uv = jnp.asarray(uv, dt)
            grid = uv.shape[:-1]
            betas = jnp.atleast_1d(jnp.asarray(betas, dt))
            out = self._exported.call(
                uv.reshape(-1, uv.shape[-1]),
                jnp.asarray(lnpi0, dt).reshape(-1),
                jnp.asarray(mudotn, dt).reshape(-1),
                betas,
                jnp.asarray(seed, jnp.int32),
            )
            reshape = lambda a: a.reshape(a.shape[:1] + grid)  # noqa: E731
            if m["nrep"]:
                return reshape(out[0]), reshape(out[1])
            return reshape(out)
        if m["family"] == "mbar":
            u_kn, n_k, alphas, u_base, x_n = args
            u_kn = jnp.asarray(u_kn, dt)
            if u_kn.shape[0] != m["k_states"]:
                msg = (
                    f"artifact exported for K={m['k_states']} states, got "
                    f"u_kn {u_kn.shape}"
                )
                raise ValueError(msg)
            x_n = jnp.asarray(x_n, dt)
            squeeze = x_n.ndim == 1
            if squeeze:
                x_n = x_n[:, None]
            alphas = np.atleast_1d(np.asarray(alphas, dt))
            a = alphas.shape[0]
            n_pad = -a % m["chunk"]
            a_pad = np.concatenate([alphas, np.full(n_pad, alphas[-1], dt)])
            f_k, res, out = self._exported.call(
                u_kn,
                jnp.asarray(n_k, dt),
                jnp.asarray(a_pad),
                jnp.asarray(u_base, dt),
                x_n,
            )
            out = out[:a, 0] if squeeze else out[:a]
            return f_k, res, out
        if m["family"] == "gpr":
            (locs,) = args
            locs = jnp.asarray(locs, dt)
            if locs.ndim == 1:
                if m["obs_dims"] != 1:
                    msg = f"locs must be (M, {m['obs_dims']}) for this model"
                    raise ValueError(msg)
                locs = locs[:, None]
            return self._exported.call(locs)
        msg = f"unknown artifact family {m['family']!r}"
        raise ValueError(msg)


def _do_export(fn, specs, platforms):
    return jax_export.export(jax.jit(fn), platforms=tuple(platforms))(*specs)


def export_extrap_pipeline(
    order: int,
    beta0: float,
    *,
    minus_log: bool = False,
    xalpha: bool = False,
    x_is_u: bool = False,
    nrep: int = 0,
    weighted: bool = False,
    nval: int | None = None,
    dtype=jnp.float32,
    platforms=("cpu", "tpu"),
) -> ExportedPipeline:
    r"""Export the β-extrapolation pipeline as a portable AOT artifact.

    Shape-polymorphic in the sample count ``R`` and query count ``A``:
    one artifact serves any number of samples and target β's.  The value
    width ``nval`` is symbolic too unless pinned (pin it if your serving
    shapes are fixed — gives XLA exact tiling).

    Parameters mirror :func:`~thermoextrap_tpu.pipeline.make_extrap_pipeline`
    (order/beta0 static; ``minus_log``; ``xalpha`` serves β-dependent
    observables — the artifact takes ``xv (R, order+1, *val)`` with the
    β-derivative columns and returns ``(A, *val)``; ``nrep`` bootstrap
    replicates with Poisson(1) frequencies; ``weighted`` adds a per-sample
    weight operand).

    Returns an :class:`ExportedPipeline`; call it directly, or ``.save``
    and :func:`load_exported` in the serving process.
    """
    if x_is_u and xalpha:
        msg = "x_is_u and xalpha are mutually exclusive"
        raise ValueError(msg)
    dt = jnp.dtype(dtype)
    dims = "R, A" + ("" if (nval or x_is_u) else ", V")
    syms = jax_export.symbolic_shape(dims)
    R, A = syms[0], syms[1]
    specs = [jax.ShapeDtypeStruct((R,), dt)]
    if not x_is_u:
        V = nval if nval else syms[2]
        # with xalpha the exported program sees the flat packed width; the
        # call wrapper reshapes (R, order+1, *val) <-> (R, (order+1)*vv)
        xv_width = (order + 1) * V if xalpha else V
        specs.append(jax.ShapeDtypeStruct((R, xv_width), dt))
    specs.append(jax.ShapeDtypeStruct((A,), dt))
    if weighted:
        specs.append(jax.ShapeDtypeStruct((R,), dt))
    specs.append(jax.ShapeDtypeStruct((), jnp.int32))
    fn = _extrap_fn(order, beta0, minus_log, nrep, weighted, xalpha, x_is_u)
    meta = {
        "family": "extrap",
        "order": order,
        "beta0": beta0,
        "minus_log": minus_log,
        "xalpha": xalpha,
        "x_is_u": x_is_u,
        "nrep": nrep,
        "weighted": weighted,
        "nval": nval,
        "dtype": dt.name,
    }
    return ExportedPipeline(_do_export(fn, specs, platforms), meta)


def export_lnpi_pipeline(
    order: int,
    beta0: float,
    *,
    nrep: int = 0,
    dtype=jnp.float32,
    platforms=("cpu", "tpu"),
) -> ExportedPipeline:
    r"""Export the lnΠ grid pipeline (reference lnpi.py:372-438 workflow)
    as an AOT artifact, shape-polymorphic in the (flattened) macrostate
    grid size ``B``, sample count ``R``, and query count ``A``.  The
    loaded artifact accepts ``uv (*grid, R)`` and reshapes for you.
    """
    if order < 1:
        msg = f"lnPi order must be >= 1, got {order}"
        raise ValueError(msg)
    dt = jnp.dtype(dtype)
    B, R, A = jax_export.symbolic_shape("B, R, A")
    specs = [
        jax.ShapeDtypeStruct((B, R), dt),
        jax.ShapeDtypeStruct((B,), dt),
        jax.ShapeDtypeStruct((B,), dt),
        jax.ShapeDtypeStruct((A,), dt),
        jax.ShapeDtypeStruct((), jnp.int32),
    ]
    meta = {
        "family": "lnpi",
        "order": order,
        "beta0": beta0,
        "nrep": nrep,
        "dtype": dt.name,
    }
    return ExportedPipeline(
        _do_export(_lnpi_fn(order, beta0, nrep), specs, platforms), meta
    )


def export_perturb_pipeline(
    beta0: float,
    *,
    nrep: int = 0,
    weighted: bool = False,
    nval: int | None = None,
    dtype=jnp.float32,
    platforms=("cpu", "tpu"),
) -> ExportedPipeline:
    r"""Export the exponential-reweighting perturbation pipeline
    (:func:`~thermoextrap_tpu.pipeline.make_perturb_pipeline`; reference
    ``PerturbModel``, models.py:1009-1046) as an AOT artifact,
    shape-polymorphic in the sample count ``R``, query count ``A``, and
    (unless ``nval`` pins it) the value width ``V``.

    The loaded artifact is called ``artifact(uv, xv, betas[, weight=])``
    → ``pred (A, *val)`` or ``(pred, std)`` with ``nrep`` bootstrap
    replicates (Poisson(1) frequency table — moderate-R serving; the
    extrapolation artifacts are the 1e8-sample path).

    Equal-seed parity with the live pipeline: the artifact draws its
    table through the same ``poisson1_freq`` helper, so counts match the
    live ``poisson="table"`` pipeline on EVERY backend (float-level vs
    the CPU/XLA einsum; association-level ~1e-6 vs the accelerator's
    fused kernel, which dots the identical table in a different order).
    The live ``poisson="device"`` mode draws in-kernel instead — its own
    stream, not reproducible by an artifact.
    """
    dt = jnp.dtype(dtype)
    dims = "R, A" + ("" if nval else ", V")
    syms = jax_export.symbolic_shape(dims)
    R, A = syms[0], syms[1]
    V = nval if nval else syms[2]
    specs = [
        jax.ShapeDtypeStruct((R,), dt),
        jax.ShapeDtypeStruct((R, V), dt),
        jax.ShapeDtypeStruct((A,), dt),
    ]
    if weighted:
        specs.append(jax.ShapeDtypeStruct((R,), dt))
    specs.append(jax.ShapeDtypeStruct((), jnp.int32))
    meta = {
        "family": "perturb",
        "beta0": beta0,
        "nrep": nrep,
        "weighted": weighted,
        "nval": nval,
        "dtype": dt.name,
    }
    fn = _perturb_fn(beta0, nrep, weighted)
    return ExportedPipeline(_do_export(fn, specs, platforms), meta)


def export_volume_pipeline(
    volume0: float,
    *,
    ndim: int = 3,
    nrep: int = 0,
    weighted: bool = False,
    nval: int | None = None,
    dtype=jnp.float32,
    platforms=("cpu", "tpu"),
) -> ExportedPipeline:
    r"""Export the first-order volume-extrapolation pipeline
    (:func:`~thermoextrap_tpu.pipeline.make_volume_pipeline`) as an AOT
    artifact, shape-polymorphic in the sample count ``R``, query count
    ``A``, and (unless ``nval`` pins it) the value width ``V``.

    The loaded artifact is called
    ``artifact(wv, xv, dxdqv, volumes[, weight=]) -> pred | (pred, std)``
    with ``wv (R,)`` the temperature-scaled virial and ``xv``/``dxdqv``
    ``(R, *val)`` (a bare ``(R,)`` is accepted for scalar observables).
    """
    dt = jnp.dtype(dtype)
    dims = "R, A" + ("" if nval else ", V")
    syms = jax_export.symbolic_shape(dims)
    R, A = syms[0], syms[1]
    V = nval if nval else syms[2]
    specs = [
        jax.ShapeDtypeStruct((R,), dt),
        jax.ShapeDtypeStruct((R, V), dt),
        jax.ShapeDtypeStruct((R, V), dt),
        jax.ShapeDtypeStruct((A,), dt),
    ]
    if weighted:
        specs.append(jax.ShapeDtypeStruct((R,), dt))
    specs.append(jax.ShapeDtypeStruct((), jnp.int32))
    meta = {
        "family": "volume",
        "volume0": volume0,
        "ndim": ndim,
        "nrep": nrep,
        "weighted": weighted,
        "nval": nval,
        "dtype": dt.name,
    }
    fn = _volume_fn(volume0, ndim, nrep, weighted)
    return ExportedPipeline(_do_export(fn, specs, platforms), meta)


def export_gpr_predictor(
    model,
    d_new=None,
    *,
    dtype=jnp.float32,
    mean_new_fn=None,
    platforms=("cpu", "tpu"),
) -> ExportedPipeline:
    r"""Export a trained GPR as an AOT serving artifact.

    Freezes the model with
    :func:`~thermoextrap_tpu.gpr_active.serving.freeze_predictor` (the
    training-side f64 solves fold into constants; prediction is pure
    matmuls) and exports the predictor shape-polymorphically in the query
    count ``M``.  The serving process calls ``artifact(locs)`` →
    ``(mean, var)``, each ``(M, out_dim)``, with no model code imported
    and no Python tracing.

    ``d_new`` / ``mean_new_fn`` as in ``freeze_predictor`` (one artifact
    per served derivative order).
    """
    from .gpr_active.serving import freeze_predictor

    pred = freeze_predictor(model, d_new, dtype=dtype, mean_new_fn=mean_new_fn)
    dt = jnp.dtype(dtype)
    (M,) = jax_export.symbolic_shape("M")
    specs = [jax.ShapeDtypeStruct((M, pred.obs_dims), dt)]
    meta = {"family": "gpr", **pred.meta, "d_new": list(pred.meta["d_new"])}
    return ExportedPipeline(_do_export(pred.predict_fn, specs, platforms), meta)


def export_mbar_reweighter(
    k_states: int,
    *,
    tol: float | None = None,
    max_iter: int = 1000,
    method: str = "hybrid",
    chunk: int = 8,
    dtype=jnp.float32,
    platforms=("cpu", "tpu"),
) -> ExportedPipeline:
    r"""Export the MBAR solve + reweighting pipeline as an AOT artifact.

    Reference role: ``pymbar`` inside ``MBARModel`` (models.py:1049-1111)
    — but deployable without importing any model code.  The program takes
    ``(u_kn (K, N), n_k (K,), alphas (A,), u_base (N,), x_n (N, V))``,
    solves the free energies with the Newton/self-consistent hybrid and
    evaluates ``<x>`` at every target ``alpha * u_base`` in ``chunk``-sized
    streamed blocks (the (A, N) weight matrix never materializes — serving
    N at 1e8 with hundreds of targets fits HBM).  Returns
    ``(f_k, residual, out (A, V))``.

    Shape-polymorphic in ``N``, ``V``, and the α-count (exported as a
    multiple of ``chunk``; the call wrapper pads with the last α and
    slices).  ``k_states`` is static (it fixes the Newton system size).
    """
    if k_states < 2:
        msg = f"need k_states >= 2, got {k_states}"
        raise ValueError(msg)
    dt = jnp.dtype(dtype)
    N, V, AC = jax_export.symbolic_shape("N, V, AC")
    specs = [
        jax.ShapeDtypeStruct((k_states, N), dt),
        jax.ShapeDtypeStruct((k_states,), dt),
        jax.ShapeDtypeStruct((chunk * AC,), dt),
        jax.ShapeDtypeStruct((N,), dt),
        jax.ShapeDtypeStruct((N, V), dt),
    ]
    meta = {
        "family": "mbar",
        "k_states": k_states,
        "tol": tol,
        "max_iter": max_iter,
        "method": method,
        "chunk": chunk,
        "dtype": dt.name,
    }
    fn = _mbar_fn(tol, max_iter, method, chunk)
    return ExportedPipeline(_do_export(fn, specs, platforms), meta)


def bucketed_runner(artifact: ExportedPipeline, buckets=None):
    r"""Any-``R`` serving from a loaded artifact with a BOUNDED compile count.

    Shape polymorphism removes re-tracing/re-export, but the backend still
    compiles once per concrete input shape at call time.  This wrapper pads
    every request up to the smallest configured bucket with **zero-weight**
    samples (exact — the same scheme as
    :func:`~thermoextrap_tpu.pipeline.make_bucketed_extrap_runner`), so a
    deployment compiles at most ``len(buckets)`` programs, persistable
    across processes with the compilation cache.

    Requires an ``extrap``, ``perturb``, or ``volume`` artifact exported
    with ``weighted=True`` (the padding rides the weight operand; the
    extrap kernels and the perturb ``-inf`` log-mask both drop
    zero-weight samples exactly).  ``buckets`` defaults to powers of
    two ``2^12 .. 2^27``; requests above the largest bucket run at exact
    shape (one-off compile).

    Returns ``serve(uv, xv, betas, weight=None, seed=0)`` (extrap /
    perturb), ``serve(uv, betas, weight=None, seed=0)`` for an
    ``x_is_u`` artifact, or ``serve(wv, xv, dxdqv, volumes, weight=None,
    seed=0)`` for a volume artifact.
    """
    from .pipeline import bucket_pad, normalize_buckets

    m = artifact.meta
    if m["family"] not in ("extrap", "perturb", "volume") or not m["weighted"]:
        msg = (
            "bucketed_runner needs an extrap, perturb, or volume artifact "
            f"exported with weighted=True, got family={m['family']!r} "
            f"weighted={m.get('weighted')}"
        )
        raise ValueError(msg)
    buckets = normalize_buckets(buckets)

    if m["family"] == "volume":

        def serve(wv, xv, dxdqv, volumes, weight=None, seed=0):
            xv = np.asarray(xv)
            dxdqv = np.asarray(dxdqv)
            if xv.ndim == 1:
                xv = xv[:, None]
            if dxdqv.ndim == 1:
                dxdqv = dxdqv[:, None]
            wvp, (xvp, dxp), wp = bucket_pad(wv, (xv, dxdqv), weight, buckets)
            return artifact(wvp, xvp, dxp, volumes, weight=wp, seed=seed)

    elif m.get("x_is_u"):

        def serve(uv, betas, weight=None, seed=0):
            uvp, _xvp, wp = bucket_pad(uv, None, weight, buckets)
            return artifact(uvp, betas, weight=wp, seed=seed)

    else:

        def serve(uv, xv, betas, weight=None, seed=0):
            xv = np.asarray(xv)
            if xv.ndim == 1:
                xv = xv[:, None]
            uvp, xvp, wp = bucket_pad(uv, xv, weight, buckets)
            return artifact(uvp, xvp, betas, weight=wp, seed=seed)

    serve.buckets = buckets
    return serve


class StreamingExportedPipeline:
    r"""A streaming serving bundle: ``update`` + ``predict`` programs plus
    the initial accumulator state, in one file.

    The moment state crosses the artifact boundary as an OPAQUE tuple of
    arrays (the exported programs' flat calling convention), so the
    serving process needs no package code and no pytree registry:

    >>> art = export_streaming_extrap_pipeline(2, 1.0)       # doctest: +SKIP
    >>> state = art.init_state()                             # doctest: +SKIP
    >>> state = art.update(state, uv_chunk, xv_chunk)        # doctest: +SKIP
    >>> pred = art.predict(state, betas)                     # doctest: +SKIP

    ``update`` is shape-polymorphic in the chunk length ``R`` and
    ``predict`` in the query count ``A``; the state shapes are static
    (tiny: ``O(nrep * (order+2) * prod(val/grid shape))`` floats).
    Checkpointing a stream = persisting the state tuple: use
    :meth:`save_state` / :meth:`load_state` (dtype-aware — plain
    ``np.savez`` silently corrupts ``bfloat16`` leaves to raw void
    arrays) — the restart seam of the in-process pipeline's
    ``DataCentralMoments.save``.

    Chunk lengths are polymorphic, but the backend still compiles once
    per *concrete* chunk shape (cached in-process): producers with ragged
    chunks should pad to a fixed length — exactly, via zero-weight
    samples, when exported ``weighted=True`` — or enable the persistent
    compilation cache.
    """

    def __init__(self, update_exp, predict_exp, state0, meta: dict):
        self._upd = update_exp
        self._prd = predict_exp
        self._state0 = tuple(np.asarray(a) for a in state0)
        self.meta = dict(meta)

    def _dtype(self):
        return jnp.dtype(self.meta["dtype"])

    def init_state(self) -> tuple:
        """A fresh empty accumulator state (copy — states are immutable
        values, but don't let callers alias the template)."""
        return tuple(np.array(a, copy=True) for a in self._state0)

    def update(self, state, uv, xv=None, weight=None, dxdqv=None):
        """Fold one sample chunk into ``state``; returns the new state.

        Extrap bundles: ``update(state, uv, xv[, weight=])`` (``xv`` omitted
        for ``x_is_u``); lnΠ bundles: ``update(state, uv_grid)``; volume
        bundles: ``update(state, wv, xv, dxdqv=...[, weight=])``.
        """
        m = self.meta
        dt = self._dtype()
        uv = jnp.asarray(uv, dt)
        args = list(state)
        if dxdqv is not None and m["family"] != "streaming_volume":
            msg = "dxdqv= is only for streaming_volume bundles"
            raise ValueError(msg)
        if m["family"] == "streaming_volume":
            if xv is None or dxdqv is None:
                msg = (
                    "volume streaming update takes (state, wv, xv, "
                    "dxdqv=...[, weight=])"
                )
                raise ValueError(msg)
            val_shape = tuple(m["val_shape"])
            xv = jnp.asarray(xv, dt).reshape(uv.shape[0], *val_shape)
            dxdqv = jnp.asarray(dxdqv, dt).reshape(uv.shape[0], *val_shape)
            args.extend([uv, xv, dxdqv])
            if m["weighted"]:
                if weight is None:
                    msg = "this artifact was exported weighted=True; pass weight="
                    raise ValueError(msg)
                args.append(jnp.asarray(weight, dt))
            elif weight is not None:
                msg = (
                    "this artifact takes no weight operand (export with "
                    "weighted=True); refusing to silently ignore weight="
                )
                raise ValueError(msg)
            return tuple(self._upd.call(*args))
        if m["family"] == "streaming_lnpi":
            if xv is not None or weight is not None:
                msg = "lnPi streaming update takes only (state, uv_grid)"
                raise ValueError(msg)
            args.append(uv.reshape(*m["grid_shape"], uv.shape[-1]))
        else:
            if m.get("x_is_u"):
                if xv is not None:
                    msg = (
                        "x_is_u streaming update takes (state, uv[, weight=])"
                    )
                    raise ValueError(msg)
                args.append(uv)
            else:
                if xv is None:
                    fam = m["family"].removeprefix("streaming_")
                    msg = (
                        f"{fam} streaming update takes (state, uv, xv"
                        "[, weight=])"
                    )
                    raise ValueError(msg)
                xv = jnp.asarray(xv, dt)
                val_shape = tuple(m["val_shape"])
                if m.get("xalpha"):
                    val_shape = (m["order"] + 1, *val_shape)
                args.extend([uv, xv.reshape(uv.shape[0], *val_shape)])
            if m["weighted"]:
                if weight is None:
                    msg = "this artifact was exported weighted=True; pass weight="
                    raise ValueError(msg)
                args.append(jnp.asarray(weight, dt))
            elif weight is not None:
                msg = (
                    "this artifact takes no weight operand (export with "
                    "weighted=True); refusing to silently ignore weight="
                )
                raise ValueError(msg)
        return tuple(self._upd.call(*args))

    def predict(self, state, *args):
        """Extrap/volume: ``predict(state, betas)``; lnΠ:
        ``predict(state, lnpi0, mudotn, betas)``; perturb:
        ``predict(state)`` (targets baked into the artifact).  Returns
        ``pred`` or ``(pred, std)`` when exported with ``nrep > 0``."""
        m = self.meta
        dt = self._dtype()
        if m["family"] == "streaming_perturb":
            if args:
                msg = (
                    "perturb streaming predict takes only (state) — the "
                    "target betas are baked into the artifact"
                )
                raise ValueError(msg)
            return self._prd.call(*state)
        if m["family"] == "streaming_lnpi":
            lnpi0, mudotn, betas = args
            grid = tuple(m["grid_shape"])
            call = [
                *state,
                jnp.asarray(lnpi0, dt).reshape(grid),
                jnp.asarray(mudotn, dt).reshape(grid),
                jnp.atleast_1d(jnp.asarray(betas, dt)),
            ]
        else:
            (betas,) = args
            call = [*state, jnp.atleast_1d(jnp.asarray(betas, dt))]
        return self._prd.call(*call)

    # -- state persistence (dtype-aware) --------------------------------------
    # plain np.savez silently serializes ml_dtypes leaves (bfloat16) as raw
    # void ('V2') arrays that np.load cannot restore, so states are encoded
    # as raw bytes with (dtype name, shape) metadata instead
    @staticmethod
    def _encode_state(state):
        spec = [[np.asarray(a).dtype.name, list(np.asarray(a).shape)] for a in state]
        blob = b"".join(np.ascontiguousarray(np.asarray(a)).tobytes() for a in state)
        return spec, blob

    @staticmethod
    def _decode_state(spec, blob: bytes):
        out, off = [], 0
        for name, shape in spec:
            dt = _dtype_by_name(name)
            n = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
            out.append(
                np.frombuffer(blob[off : off + n], dtype=dt).reshape(shape).copy()
            )
            off += n
        return tuple(out)

    def save_state(self, path, state) -> None:
        """Checkpoint a state tuple (any leaf dtype, bfloat16 included)."""
        spec, blob = self._encode_state(state)
        with open(path, "wb") as f:
            f.write(json.dumps(spec).encode() + b"\n" + blob)

    def load_state(self, path) -> tuple:
        """Reload a :meth:`save_state` checkpoint."""
        with open(path, "rb") as f:
            head, blob = f.read().split(b"\n", 1)
        return self._decode_state(json.loads(head.decode()), blob)

    # -- persistence ---------------------------------------------------------
    def serialize(self) -> bytes:
        u = self._upd.serialize()
        p = self._prd.serialize()
        spec, s = self._encode_state(self._state0)
        header = {
            **self.meta,
            "_sizes": [len(u), len(p), len(s)],
            "_state_spec": spec,
        }
        return (
            _MAGIC_BUNDLE
            + b"\n"
            + json.dumps(header, sort_keys=True).encode()
            + b"\n"
            + bytes(u)
            + bytes(p)
            + s
        )

    def save(self, path) -> None:
        with open(path, "wb") as f:
            f.write(self.serialize())

    @classmethod
    def _from_payload(cls, header: dict, payload: bytes):
        nu, np_, ns = header.pop("_sizes")
        spec = header.pop("_state_spec")
        upd = jax_export.deserialize(bytearray(payload[:nu]))
        prd = jax_export.deserialize(bytearray(payload[nu : nu + np_]))
        state0 = cls._decode_state(spec, payload[nu + np_ : nu + np_ + ns])
        return cls(upd, prd, state0, header)


def _export_streaming(family, factory_kwargs, meta, update_sig, predict_sig,
                      platforms):
    """Shared export driver: trace the in-process streaming pipeline's
    jitted update/predict over a FLAT state tuple and symbolic chunk/query
    dims, under the XLA-forced dispatch (no Mosaic custom calls in the
    artifact)."""
    from .ops.dispatch import use_impl
    from .pipeline import (
        make_streaming_extrap_pipeline,
        make_streaming_lnpi_pipeline,
        make_streaming_perturb_pipeline,
        make_streaming_volume_pipeline,
    )

    factory = {
        "streaming_lnpi": make_streaming_lnpi_pipeline,
        "streaming_perturb": make_streaming_perturb_pipeline,
        "streaming_volume": make_streaming_volume_pipeline,
    }.get(family, make_streaming_extrap_pipeline)
    state0, update, predict = factory(xla_only=True, **factory_kwargs)
    leaves0, treedef = jax.tree.flatten(state0)
    n = len(leaves0)
    state_specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves0]

    def upd_flat(*args):
        st = jax.tree.unflatten(treedef, args[:n])
        return tuple(jax.tree.leaves(update(st, *update_sig["args"](args, n))))

    def pred_flat(*args):
        st = jax.tree.unflatten(treedef, args[:n])
        return predict(st, *args[n:])

    with use_impl("xla"):
        upd_exp = _do_export(
            upd_flat, state_specs + update_sig["specs"], platforms
        )
        prd_exp = _do_export(
            pred_flat, state_specs + predict_sig["specs"], platforms
        )
    return StreamingExportedPipeline(
        upd_exp, prd_exp, [np.asarray(l) for l in leaves0], meta
    )


def export_streaming_extrap_pipeline(
    order: int,
    beta0: float,
    *,
    minus_log: bool = False,
    xalpha: bool = False,
    x_is_u: bool = False,
    val_shape: tuple = (),
    nrep: int = 0,
    seed: int = 0,
    weighted: bool = False,
    dtype=jnp.float32,
    platforms=("cpu", "tpu"),
) -> StreamingExportedPipeline:
    r"""Export the streaming β-extrap pipeline
    (:func:`~thermoextrap_tpu.pipeline.make_streaming_extrap_pipeline`) as
    an AOT bundle: ``update`` (polymorphic in chunk length ``R``) +
    ``predict`` (polymorphic in query count ``A``) + the initial state.

    The exported programs use the pure-XLA compute paths; with ``nrep``
    the replicate frequencies come from a per-chunk ``poisson1_freq``
    table keyed on ``(seed, chunk index)`` carried in the state — the
    exported fold matches the in-process ``xla_only=True`` pipeline
    exactly, chunking-invariant CI semantics included.
    """
    dt = jnp.dtype(dtype)
    val_shape = tuple(int(s) for s in val_shape)
    chunk_val = (order + 1, *val_shape) if xalpha else val_shape
    (R,) = jax_export.symbolic_shape("R")
    (A,) = jax_export.symbolic_shape("A")
    upd_specs = [jax.ShapeDtypeStruct((R,), dt)]
    if not x_is_u:
        upd_specs.append(jax.ShapeDtypeStruct((R, *chunk_val), dt))
    n_ops = len(upd_specs)
    if weighted:
        upd_specs.append(jax.ShapeDtypeStruct((R,), dt))

    def upd_args(args, n):
        ops = [args[n + i] for i in range(n_ops)]
        if weighted:
            # the update factories take weight as a keyword-or-positional
            # after (uv[, xv]); positional works for both signatures
            ops.append(args[n + n_ops])
        return tuple(ops)

    meta = {
        "family": "streaming_extrap",
        "order": order,
        "beta0": beta0,
        "minus_log": minus_log,
        "xalpha": xalpha,
        "x_is_u": x_is_u,
        "val_shape": list(val_shape),
        "nrep": nrep,
        "seed": seed,
        "weighted": weighted,
        "dtype": dt.name,
    }
    return _export_streaming(
        "streaming_extrap",
        dict(
            order=order,
            beta0=beta0,
            minus_log=minus_log,
            xalpha=xalpha,
            x_is_u=x_is_u,
            val_shape=val_shape,
            dtype=dt,
            nrep=nrep,
            seed=seed,
        ),
        meta,
        {"specs": upd_specs, "args": upd_args},
        {"specs": [jax.ShapeDtypeStruct((A,), dt)]},
        platforms,
    )


def export_streaming_volume_pipeline(
    volume0: float,
    *,
    ndim: int = 3,
    val_shape: tuple = (),
    nrep: int = 0,
    seed: int = 0,
    weighted: bool = False,
    dtype=jnp.float32,
    platforms=("cpu", "tpu"),
) -> StreamingExportedPipeline:
    r"""Export the streaming volume pipeline
    (:func:`~thermoextrap_tpu.pipeline.make_streaming_volume_pipeline`) as
    an AOT bundle: ``update(state, wv, xv, dxdqv=...[, weight=])``
    (polymorphic in chunk length ``R``) + ``predict(state, volumes)``
    (polymorphic in query count ``A``) + the initial accumulator state.
    """
    dt = jnp.dtype(dtype)
    val_shape = tuple(int(s) for s in val_shape)
    (R,) = jax_export.symbolic_shape("R")
    (A,) = jax_export.symbolic_shape("A")
    upd_specs = [
        jax.ShapeDtypeStruct((R,), dt),
        jax.ShapeDtypeStruct((R, *val_shape), dt),
        jax.ShapeDtypeStruct((R, *val_shape), dt),
    ]
    if weighted:
        upd_specs.append(jax.ShapeDtypeStruct((R,), dt))
    n_ops = 4 if weighted else 3

    meta = {
        "family": "streaming_volume",
        "volume0": volume0,
        "ndim": ndim,
        "val_shape": list(val_shape),
        "nrep": nrep,
        "seed": seed,
        "weighted": weighted,
        "dtype": dt.name,
    }
    return _export_streaming(
        "streaming_volume",
        dict(
            volume0=volume0,
            ndim=ndim,
            val_shape=val_shape,
            dtype=dt,
            nrep=nrep,
            seed=seed,
        ),
        meta,
        {
            "specs": upd_specs,
            "args": lambda args, n: tuple(args[n + i] for i in range(n_ops)),
        },
        {"specs": [jax.ShapeDtypeStruct((A,), dt)]},
        platforms,
    )


def export_streaming_perturb_pipeline(
    beta0: float,
    betas,
    *,
    val_shape: tuple = (),
    nrep: int = 0,
    seed: int = 0,
    weighted: bool = False,
    dtype=jnp.float32,
    platforms=("cpu", "tpu"),
) -> StreamingExportedPipeline:
    r"""Export the streaming perturbation-reweighting pipeline
    (:func:`~thermoextrap_tpu.pipeline.make_streaming_perturb_pipeline`)
    as an AOT bundle: ``update(state, uv, xv[, weight=])`` (polymorphic in
    chunk length ``R``; the online-softmax running-max rescale lives
    inside the program) + ``predict(state)`` + the initial accumulator
    state.  The target β's are BAKED into the artifact (they define the
    accumulators); ``predict`` takes no arguments.
    """
    dt = jnp.dtype(dtype)
    val_shape = tuple(int(s) for s in val_shape)
    betas_l = [float(b) for b in np.atleast_1d(np.asarray(betas))]
    (R,) = jax_export.symbolic_shape("R")
    upd_specs = [
        jax.ShapeDtypeStruct((R,), dt),
        jax.ShapeDtypeStruct((R, *val_shape), dt),
    ]
    if weighted:
        upd_specs.append(jax.ShapeDtypeStruct((R,), dt))
    n_ops = 3 if weighted else 2

    meta = {
        "family": "streaming_perturb",
        "beta0": beta0,
        "betas": betas_l,
        "val_shape": list(val_shape),
        "nrep": nrep,
        "seed": seed,
        "weighted": weighted,
        "dtype": dt.name,
    }
    return _export_streaming(
        "streaming_perturb",
        dict(
            beta0=beta0,
            betas=jnp.asarray(betas_l, dt),
            val_shape=val_shape,
            dtype=dt,
            nrep=nrep,
            seed=seed,
        ),
        meta,
        {
            "specs": upd_specs,
            "args": lambda args, n: tuple(args[n + i] for i in range(n_ops)),
        },
        {"specs": []},
        platforms,
    )


def export_streaming_lnpi_pipeline(
    order: int,
    beta0: float,
    *,
    grid_shape: tuple,
    nrep: int = 0,
    seed: int = 0,
    dtype=jnp.float32,
    platforms=("cpu", "tpu"),
) -> StreamingExportedPipeline:
    r"""Export the streaming lnΠ macrostate-grid pipeline
    (:func:`~thermoextrap_tpu.pipeline.make_streaming_lnpi_pipeline`) as an
    AOT bundle.  The grid shape is static (exact tiling); the chunk length
    ``R`` and query count ``A`` are symbolic.  ``update(state, uv)`` takes
    ``uv (*grid_shape, R)``; ``predict(state, lnpi0, mudotn, betas)``.
    """
    if order < 1:
        msg = f"lnPi order must be >= 1, got {order}"
        raise ValueError(msg)
    dt = jnp.dtype(dtype)
    grid_shape = tuple(int(s) for s in grid_shape)
    (R,) = jax_export.symbolic_shape("R")
    (A,) = jax_export.symbolic_shape("A")
    meta = {
        "family": "streaming_lnpi",
        "order": order,
        "beta0": beta0,
        "grid_shape": list(grid_shape),
        "nrep": nrep,
        "seed": seed,
        "dtype": dt.name,
    }
    return _export_streaming(
        "streaming_lnpi",
        dict(
            order=order,
            beta0=beta0,
            grid_shape=grid_shape,
            dtype=dt,
            nrep=nrep,
            seed=seed,
        ),
        meta,
        {
            "specs": [jax.ShapeDtypeStruct((*grid_shape, R), dt)],
            "args": lambda args, n: (args[n],),
        },
        {
            "specs": [
                jax.ShapeDtypeStruct(grid_shape, dt),
                jax.ShapeDtypeStruct(grid_shape, dt),
                jax.ShapeDtypeStruct((A,), dt),
            ]
        },
        platforms,
    )


def save_exported(artifact: ExportedPipeline, path) -> None:
    """Write an artifact to ``path`` (header + StableHLO payload)."""
    artifact.save(path)


def describe_artifact(path) -> dict:
    """Inspect an artifact file WITHOUT deserializing its programs.

    Returns the header metadata plus ``kind`` (``"batch"`` /
    ``"streaming"``) and ``file_bytes`` — cheap (reads only the first two
    lines), for deployment tooling that routes or validates artifacts
    before loading them.  CLI: ``python -m thermoextrap_tpu.serving_export
    ARTIFACT [...]`` prints one JSON line per file.
    """
    import os

    with open(path, "rb") as f:
        magic = f.readline().rstrip(b"\n")
        if magic not in (_MAGIC, _MAGIC_BUNDLE):
            msg = f"{path}: not a thermoextrap_tpu export artifact"
            raise ValueError(msg)
        header = json.loads(f.readline().decode())
    header.pop("_state_spec", None)
    header.pop("_sizes", None)
    header["kind"] = "streaming" if magic == _MAGIC_BUNDLE else "batch"
    header["file_bytes"] = os.path.getsize(path)
    return header


def load_exported(path) -> ExportedPipeline | StreamingExportedPipeline:
    """Reload an artifact written by :func:`save_exported` / ``.save``.

    Dispatches on the file magic: single-program artifacts return an
    :class:`ExportedPipeline` (callable), streaming bundles a
    :class:`StreamingExportedPipeline` (``init_state/update/predict``).
    No Python tracing happens here — the programs are deserialized as-is
    and compile (cacheably) on first call.
    """
    with open(path, "rb") as f:
        raw = f.read()
    parts = raw.split(b"\n", 2)
    if len(parts) != 3 or parts[0] not in (_MAGIC, _MAGIC_BUNDLE):
        msg = f"{path}: not a thermoextrap_tpu export artifact"
        raise ValueError(msg)
    magic, header, payload = parts
    if magic == _MAGIC_BUNDLE:
        return StreamingExportedPipeline._from_payload(
            json.loads(header.decode()), payload
        )
    meta = json.loads(header.decode())
    exported = jax_export.deserialize(bytearray(payload))
    return ExportedPipeline(exported, meta)


if __name__ == "__main__":  # pragma: no cover - exercised via subprocess test
    import sys as _sys

    if len(_sys.argv) < 2:
        print(
            "usage: python -m thermoextrap_tpu.serving_export ARTIFACT [...]",
            file=_sys.stderr,
        )
        raise SystemExit(2)
    for _p in _sys.argv[1:]:
        print(json.dumps({"path": _p, **describe_artifact(_p)}, sort_keys=True))
