r"""Multi-device sharded (co)moment reduction and bootstrap.

The reference's only concurrency is numba threads + multiprocessing
(SURVEY.md §2c); there is no distributed design to port.  The TPU-native
equivalent: the sample axis (``rec``) and bootstrap-replicate axis (``rep``)
are embarrassingly parallel, so we shard them over a ``jax.sharding.Mesh``
and merge with a single ``psum`` of the tiny ``(order+1, V)`` partial-sum
tensors per shard — central-moment accumulators are trivially mergeable,
which is the whole point of this formulation (SURVEY.md §5 "long-context"
note).  Collectives ride ICI; no DCN traffic beyond initial data placement.

Exactness: a first psum establishes the *global* weighted means; each shard
then accumulates centered partial sums, merged by a second psum — bitwise
equivalent math to the single-device two-pass reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "mbar_expectations_grid_sharded",
    "mbar_solve_sharded",
    "reduce_central_comoments_sharded",
    "reduce_central_umoments_batched_sharded",
    "resample_central_comoments_sharded",
    "resample_central_umoments_batched_sharded",
    "shard_rec",
]


def make_mesh(n_devices: int | None = None, axis_names=("rec",)) -> Mesh:
    """1D (or reshaped) device mesh over the first ``n_devices`` devices."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    import numpy as np

    if len(axis_names) == 1:
        arr = np.array(devs)
    else:
        n = len(devs)
        rows = len(axis_names)
        # simple balanced factorization for 2D meshes
        a = int(np.floor(np.sqrt(n)))
        while n % a:
            a -= 1
        shape = (a, n // a) if rows == 2 else (n,)
        arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names)


def shard_rec(arr, mesh: Mesh, axis_name: str = "rec"):
    """Place an array with its leading (rec) axis sharded over the mesh."""
    spec = P(axis_name, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def _partial_sums(uv, xv, w, s_u, s_x, order):
    """Weighted shifted power sums of one shard: ((order+1,), (order+1, V))."""
    du = uv - s_u
    cols = [w]
    for _ in range(order):
        cols.append(cols[-1] * du)
    p = jnp.stack(cols, axis=1)  # (r_local, order+1)
    sum_u = p.sum(axis=0)
    sum_xu = jax.lax.dot_general(
        p,
        xv - s_x[None, :],
        (((0,), (0,)), ((), ())),
        preferred_element_type=p.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    return sum_u, sum_xu


def reduce_central_comoments_sharded(
    uv,
    xv,
    order: int,
    mesh: Mesh,
    weight=None,
    axis_name: str = "rec",
):
    r"""Exact central comoment reduction with ``rec`` sharded over ``mesh``.

    ``uv``: ``(R,)``, ``xv``: ``(R, *val)``; any dtype (compute dtype follows
    inputs — f32 on TPU, f64 on CPU x64).  Two tree-reductions (psums) of
    ``O(order * V)`` numbers regardless of R.
    """
    val_shape = xv.shape[1:]
    xflat = xv.reshape(uv.shape[0], -1)
    w = (
        jnp.ones_like(uv)
        if weight is None
        else jnp.broadcast_to(jnp.asarray(weight, uv.dtype), uv.shape)
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name, None), P(axis_name)),
        out_specs=(P(), P(), P(), P()),
    )
    def _reduce(u_l, x_l, w_l):
        # pass 1: exact global means
        stats = jnp.stack(
            [w_l.sum(), (w_l * u_l).sum()]
        )
        xsum = (w_l[:, None] * x_l).sum(axis=0)
        stats = jax.lax.psum(stats, axis_name)
        xsum = jax.lax.psum(xsum, axis_name)
        wsum, usum = stats[0], stats[1]
        ubar = usum / wsum
        xbar = xsum / wsum

        # pass 2: centered partial sums about the exact global means
        sum_u, sum_xu = _partial_sums(u_l, x_l, w_l, ubar, xbar, order)
        sum_u = jax.lax.psum(sum_u, axis_name)
        sum_xu = jax.lax.psum(sum_xu, axis_name)

        du = sum_u / wsum
        dxdu = sum_xu / wsum
        du = du.at[0].set(1.0).at[1].set(0.0)
        dxdu = dxdu.at[0].set(0.0)
        return xbar, ubar, du, dxdu

    xave, uave, du, dxdu = _reduce(uv, xflat, w)
    return (
        xave.reshape(val_shape),
        uave,
        du,
        dxdu.reshape((order + 1, *val_shape)),
    )


def reduce_central_umoments_batched_sharded(
    uv,
    order: int,
    mesh: Mesh,
    weight=None,
    axis_name: str = "rec",
):
    r"""Exact batched central u-moment reduction with the SAMPLE axis
    sharded over ``mesh`` (the lnΠ macrostate-grid workload: ``uv
    (*batch, R)`` with the grid in the batch axes, x_is_u so only
    u-moments are needed — reference lnpi.py:372-438 data path).

    Same contract as the Pallas
    :func:`ops.moments_pallas.reduce_central_umoments_batched`:
    ``(uave (*batch,), du (order+1, *batch))`` with ``du[0]=1, du[1]=0``.
    Two psums of ``O(order * batch)`` numbers; bitwise-exact two-pass math.
    """
    uv = jnp.asarray(uv)
    nb = uv.ndim - 1
    w = (
        jnp.ones_like(uv)
        if weight is None
        else jnp.broadcast_to(jnp.asarray(weight, uv.dtype), uv.shape)
    )
    rec_spec = P(*([None] * nb), axis_name)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(rec_spec, rec_spec),
        out_specs=(P(), P()),
    )
    def _reduce(u_l, w_l):
        # pass 1: exact global per-batch means
        wsum = jax.lax.psum(w_l.sum(-1), axis_name)
        ubar = jax.lax.psum((w_l * u_l).sum(-1), axis_name) / wsum

        # pass 2: centered partial sums about the exact global means
        du = u_l - ubar[..., None]
        p = w_l
        rows = [p.sum(-1)]
        for _ in range(order):
            p = p * du
            rows.append(p.sum(-1))
        sums = jax.lax.psum(jnp.stack(rows), axis_name)  # (order+1, *batch)

        du_n = sums / wsum
        du_n = du_n.at[0].set(1.0).at[1].set(0.0)
        return ubar, du_n

    return _reduce(uv, w)


def resample_central_umoments_batched_sharded(
    uv,
    freq,
    order: int,
    mesh: Mesh,
    weight=None,
    rec_axis: str = "rec",
    rep_axis: str | None = "rep",
):
    r"""Sharded batched u-moment bootstrap for grid workloads.

    ``uv (*batch, R)`` sharded over ``rec`` (last axis); ``freq (nrep, R)``
    sharded over ``(rep, rec)`` and SHARED across the batch axes — each
    bootstrap replicate resamples whole configurations, which are joint
    across the macrostate grid (the reference resamples the lnΠ rec
    dimension once for all macrostates, lnpi.py:258-286 / cmomy
    resample-along-rec semantics).

    Returns ``(uave (nrep, *batch), du (order+1, nrep, *batch))``.
    """
    uv = jnp.asarray(uv)
    nb = uv.ndim - 1
    nrep = freq.shape[0]
    w = (
        jnp.ones_like(uv)
        if weight is None
        else jnp.broadcast_to(jnp.asarray(weight, uv.dtype), uv.shape)
    )
    fdtype = uv.dtype
    rep_spec = rep_axis if rep_axis in mesh.axis_names else None
    rec_spec = P(*([None] * nb), rec_axis)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(rec_spec, rec_spec, P(rep_spec, rec_axis)),
        out_specs=(
            P(rep_spec, *([None] * nb)),
            P(None, rep_spec, *([None] * nb)),
        ),
    )
    def _resample(u_l, w_l, f_l):
        # global per-batch means as the common shift (exact, one psum)
        wsum = jax.lax.psum(w_l.sum(-1), rec_axis)
        ubar = jax.lax.psum((w_l * u_l).sum(-1), rec_axis) / wsum

        du = u_l - ubar[..., None]  # (*batch, r_local)
        f = f_l.astype(fdtype)  # (nrep_local, r_local)
        p = w_l
        rows = [jnp.einsum("pr,...r->p...", f, p)]
        for _ in range(order):
            p = p * du
            rows.append(jnp.einsum("pr,...r->p...", f, p))
        sums = jax.lax.psum(
            jnp.stack(rows), rec_axis
        )  # (order+1, nrep_local, *batch)

        m = sums / sums[0]
        uave_r = m[1] + ubar[None]  # (nrep_local, *batch)
        from ..ops.convert import shift_raw_moments

        du_r = shift_raw_moments(m, m[1])
        du_r = du_r.at[0].set(1.0).at[1].set(0.0)
        return uave_r, du_r

    uave, du = _resample(uv, w, jnp.asarray(freq))
    assert uave.shape[0] == nrep
    return uave, du


def resample_central_comoments_sharded(
    uv,
    xv,
    freq,
    order: int,
    mesh: Mesh,
    weight=None,
    rec_axis: str = "rec",
    rep_axis: str | None = "rep",
):
    r"""Sharded bootstrap: ``freq (nrep, R)`` sharded over a 2D
    ``(rep, rec)`` mesh; samples sharded over ``rec``; per-replicate shifted
    raw sums merged by psum over ``rec`` and recentered exactly.

    Returns the :func:`ops.resample.resample_central_comoments` contract.
    """
    val_shape = xv.shape[1:]
    xflat = xv.reshape(uv.shape[0], -1)
    nrep = freq.shape[0]
    w = (
        jnp.ones_like(uv)
        if weight is None
        else jnp.broadcast_to(jnp.asarray(weight, uv.dtype), uv.shape)
    )
    fdtype = uv.dtype

    rep_spec = rep_axis if rep_axis in mesh.axis_names else None

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(rec_axis),
            P(rec_axis, None),
            P(rec_axis),
            P(rep_spec, rec_axis),
        ),
        out_specs=(
            P(rep_spec, None),
            P(rep_spec),
            P(None, rep_spec),
            P(None, rep_spec, None),
        ),
    )
    def _resample(u_l, x_l, w_l, f_l):
        # global means as the common shift (exact, one psum)
        stats = jax.lax.psum(jnp.stack([w_l.sum(), (w_l * u_l).sum()]), rec_axis)
        xbar = jax.lax.psum((w_l[:, None] * x_l).sum(0), rec_axis) / stats[0]
        ubar = stats[1] / stats[0]

        du = u_l - ubar
        cols = [w_l]
        for _ in range(order):
            cols.append(cols[-1] * du)
        p = jnp.stack(cols, axis=1)  # (r_local, order+1)
        f = f_l.astype(fdtype)  # (nrep_local, r_local)
        sum_u = jax.lax.psum(
            jax.lax.dot_general(
                f, p, (((1,), (0,)), ((), ())),
                preferred_element_type=fdtype,
                precision=jax.lax.Precision.HIGHEST,
            ),
            rec_axis,
        )  # (nrep_local, order+1)
        xs = x_l - xbar[None, :]
        contrib = jnp.concatenate(
            [p[:, n : n + 1] * xs for n in range(order + 1)], axis=1
        )
        sum_xu = jax.lax.psum(
            jax.lax.dot_general(
                f, contrib, (((1,), (0,)), ((), ())),
                preferred_element_type=fdtype,
                precision=jax.lax.Precision.HIGHEST,
            ),
            rec_axis,
        )  # (nrep_local, (order+1)*V)

        wsum_r = sum_u[:, 0:1]
        m = jnp.moveaxis(sum_u / wsum_r, 1, 0)  # (order+1, nrep_local)
        v = x_l.shape[1]
        c = jnp.moveaxis(
            (sum_xu / wsum_r).reshape(-1, order + 1, v), 1, 0
        )  # (order+1, nrep_local, V)

        from ..ops.convert import shift_raw_comoments, shift_raw_moments

        uave_r = m[1] + ubar
        xave_r = c[0] + xbar[None, :]
        du_r = shift_raw_moments(m, m[1])
        x_du = shift_raw_comoments(c, m[1][:, None])
        dxdu_r = x_du - c[0][None] * du_r[:, :, None]
        du_r = du_r.at[0].set(1.0).at[1].set(0.0)
        dxdu_r = dxdu_r.at[0].set(0.0)
        return xave_r, uave_r, du_r, dxdu_r

    xave, uave, du, dxdu = _resample(uv, xflat, w, jnp.asarray(freq))
    return (
        xave.reshape((nrep, *val_shape)),
        uave,
        du,
        dxdu.reshape((order + 1, nrep, *val_shape)),
    )


# ---------------------------------------------------------------------------
# Sharded MBAR (multistate reweighting at scale)
# ---------------------------------------------------------------------------
#
# The MBAR solve and expectation evaluation reduce over the sample axis only
# (models/mbar.py): sharding ``u_kn``/``x_n`` over samples and jitting the
# plain functions lets GSPMD turn every per-iteration logsumexp / row-sum /
# Hessian matmul into a mesh psum automatically — no shard_map needed.  Each
# Newton iteration communicates O(K + K^2) numbers regardless of N.
# (Reference role: pymbar inside MBARModel, models.py:1049-1111.)


@functools.lru_cache(maxsize=32)
def _mbar_solve_jitted(mesh, tol, max_iter, method):
    from ..models.mbar import mbar_solve_info

    rep = NamedSharding(mesh, P())

    def run(u_kn, n_k, logm):
        return mbar_solve_info(
            u_kn,
            n_k,
            tol=tol,
            max_iter=max_iter,
            method=method,
            log_sample_weight=logm,
        )

    return jax.jit(run, out_shardings=(rep, rep, rep))


def _pad_cols(arr, n_pad, fill=0.0):
    if n_pad == 0:
        return arr
    pad = [(0, 0)] * (arr.ndim - 1) + [(0, n_pad)]
    return jnp.pad(arr, pad, constant_values=fill)


def mbar_solve_sharded(
    u_kn,
    n_k,
    mesh: Mesh,
    tol: float | None = None,
    max_iter: int = 10000,
    method: str = "hybrid",
    axis_name: str = "rec",
):
    """:func:`models.mbar.mbar_solve_info` with samples sharded over ``mesh``.

    ``u_kn`` is placed with its sample axis (axis 1) sharded; the returned
    ``(f_k, n_iter, residual)`` are replicated.  Numerically the psum tree
    differs from the single-device sum order only at rounding level.
    """
    u_kn = jnp.asarray(u_kn)
    n_dev = mesh.devices.size
    n_pad = -u_kn.shape[1] % n_dev
    logm = None
    if n_pad:
        # zero-weight padding: -inf log-mask drops the extra columns from
        # every sample reduction exactly (models/mbar.py log_sample_weight)
        u_kn = _pad_cols(u_kn, n_pad)
        logm = jnp.concatenate(
            [
                jnp.zeros(u_kn.shape[1] - n_pad, u_kn.dtype),
                jnp.full(n_pad, -jnp.inf, u_kn.dtype),
            ]
        )
        logm = jax.device_put(logm, NamedSharding(mesh, P(axis_name)))
    u_kn = jax.device_put(u_kn, NamedSharding(mesh, P(None, axis_name)))
    n_k = jnp.asarray(n_k, dtype=u_kn.dtype)
    return _mbar_solve_jitted(mesh, tol, max_iter, method)(u_kn, n_k, logm)


@functools.lru_cache(maxsize=32)
def _mbar_grid_jitted(mesh):
    from ..models.mbar import mbar_expectations_grid

    def run(u_kn, n_k, f_k, u_targets, x_n, logm):
        return mbar_expectations_grid(
            u_kn, n_k, f_k, u_targets, x_n, log_sample_weight=logm
        )

    return jax.jit(run, out_shardings=NamedSharding(mesh, P()))


def mbar_expectations_grid_sharded(
    u_kn,
    n_k,
    f_k,
    u_targets,
    x_n,
    mesh: Mesh,
    axis_name: str = "rec",
):
    """:func:`models.mbar.mbar_expectations_grid` with samples sharded.

    ``u_kn`` (K, N) and ``u_targets`` (A, N) shard over axis 1; ``x_n``
    (N, V) over axis 0.  The (A, N) @ (N, V) weighted-average matmul
    contracts the sharded axis — one psum of the tiny (A, V) result.
    """
    cols = NamedSharding(mesh, P(None, axis_name))
    rows = NamedSharding(mesh, P(axis_name, None))
    u_kn = jnp.asarray(u_kn)
    x_n = jnp.asarray(x_n, u_kn.dtype)
    if x_n.ndim == 1:
        x_n = x_n[:, None]
    n_dev = mesh.devices.size
    n_pad = -u_kn.shape[1] % n_dev
    logm = None
    if n_pad:
        u_kn = _pad_cols(u_kn, n_pad)
        u_targets = _pad_cols(jnp.asarray(u_targets, u_kn.dtype), n_pad)
        x_n = jnp.pad(x_n, ((0, n_pad), (0, 0)))
        logm = jnp.concatenate(
            [
                jnp.zeros(u_kn.shape[1] - n_pad, u_kn.dtype),
                jnp.full(n_pad, -jnp.inf, u_kn.dtype),
            ]
        )
        logm = jax.device_put(logm, NamedSharding(mesh, P(axis_name)))
    u_kn = jax.device_put(u_kn, cols)
    u_targets = jax.device_put(jnp.asarray(u_targets, u_kn.dtype), cols)
    x_n = jax.device_put(jnp.asarray(x_n, u_kn.dtype), rows)
    n_k = jnp.asarray(n_k, dtype=u_kn.dtype)
    f_k = jnp.asarray(f_k, dtype=u_kn.dtype)
    return _mbar_grid_jitted(mesh)(u_kn, n_k, f_k, u_targets, x_n, logm)
