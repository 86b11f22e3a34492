r"""Bootstrap resampling of (co)moments.

TPU-native replacement for ``cmomy``'s ``wrap_resample_vals`` /
``resample_and_reduce`` / ``factory_sampler`` / ``IndexSampler`` usage
(/root/reference/src/thermoextrap/data.py:403-449, 1000-1055, 1285-1392,
1750-1813).

Key kernel-design decision (SURVEY.md §7 "hard parts"): instead of the
gather-heavy index formulation, resampled moments are computed as a
**frequency-matrix product**,

    ``moments[rep] = freq[rep, :] @ per-sample-contributions[:, ...]``

which is a single ``(nrep, R) @ (R, C)`` matmul on the MXU.  The frequency
table is exactly equivalent to index resampling (``freq[r, i]`` = number of
times sample ``i`` appears in replicate ``r``).

Numerical stability: samples are pre-centered at the *global* means before
the per-replicate raw accumulation; per-replicate central moments are then
recovered by an exact binomial shift (central moments are shift-invariant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .convert import shift_raw_comoments, shift_raw_moments
from .moments import u_power_stack

__all__ = [
    "freq_from_indices",
    "random_freq",
    "random_indices",
    "resample_central_comoments",
    "resample_central_umoments_batched",
    "resample_raw_comoments",
    "resample_values",
]


def random_indices(rng, nrep: int, nrec: int, nsamp: int | None = None):
    """Uniform bootstrap index table ``(nrep, nsamp)`` (reference
    ``cmomy.factory_sampler`` semantics: sample with replacement)."""
    nsamp = nrec if nsamp is None else nsamp
    return jax.random.randint(rng, (nrep, nsamp), 0, nrec)


def freq_from_indices(indices, nrec: int, dtype=jnp.int32):
    """Count table ``freq[r, i] = #{j : indices[r, j] == i}`` via scatter-add.

    ``dtype``: storage dtype of the table.  The Pallas bootstrap kernel
    streams the table in its native int dtype, and the table is its
    dominant HBM stream — ``jnp.int8`` cuts that traffic 4x (measured +27%
    end to end, benches/bench_freq_v2.py).  Bootstrap counts are
    ~Binomial(nrec, 1/nrec) ≈ Poisson(1); at ``nrec >= 64`` the chance any
    count exceeds int8's 127 is < 1e-200, so the narrow table is
    statistically safe — but it is an *opt-in* because a pathological
    ``indices`` input (e.g. a constant column) can overflow it silently.
    """
    nrep = indices.shape[0]
    freq = jnp.zeros((nrep, nrec), dtype=dtype)
    rep_ids = jnp.broadcast_to(jnp.arange(nrep)[:, None], indices.shape)
    return freq.at[rep_ids, indices].add(1)


# Poisson(1) CDF, truncated at count 9 (P(X>9) ~ 1.1e-7 per draw) — the
# canonical constant for EVERY Poisson-bootstrap draw in the package: the
# Pallas in-kernel PRNG (ops/moments_pallas._poisson_draw) and the XLA
# freq-materializing paths (:func:`poisson1_freq`) share it so the
# truncation contract is identical everywhere.
POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
    0.9999988747974049,
)


def poisson1_freq(rng, shape, dtype=jnp.float32):
    """Poisson(1) frequency table via the u32 CDF-threshold sum.

    One uniform u32 draw + 9 compares per entry — the same transform the
    in-kernel Pallas bootstrap runs at ~200 Gdraw/s on chip
    (``PRNG_ROOF.json``).  ``jax.random.poisson`` lowers to an iterative
    transformed-rejection loop that measured ~25x slower for the big
    ``(nrep, R)`` tables the perturbation/freq-matmul paths materialize;
    use this for any hot Poisson(1) table.  Marginal distribution is
    Poisson(1) truncated at 9, matching the Pallas kernels' contract (the
    concrete values differ from ``jax.random.poisson`` at equal key —
    both are valid iid streams; artifacts and live pipelines always draw
    through the SAME helper, so equal-seed comparisons stay matched).
    """
    bits = jax.random.bits(rng, shape, dtype=jnp.uint32)
    f = jnp.zeros(shape, jnp.int32)
    for cdf in POISSON1_CDF:
        f = f + (bits > jnp.uint32(int(cdf * 4294967296.0))).astype(jnp.int32)
    return f.astype(dtype)


def random_freq(rng, nrep: int, nrec: int, method: str = "multinomial", dtype=jnp.int32):
    """Random frequency table.

    ``multinomial``: exact bootstrap distribution (each row sums to nrec).
    ``poisson``: Poisson(1) bootstrap — iid entries, embarrassingly parallel,
    asymptotically equivalent; row sums vary (weights normalize per replicate).
    Drawn via :func:`poisson1_freq` (round 4 on): the marginal is Poisson(1)
    TRUNCATED at 9 (P(X>9) ~ 1.1e-7 per entry) and the concrete draws at
    equal key differ from the pre-round-4 ``jax.random.poisson`` stream —
    persisted equal-seed comparisons across versions will see different
    replicates.  Pass ``method="poisson_exact"`` for the legacy exact
    (untruncated) ``jax.random.poisson`` marginal and stream — ~25x slower
    for large tables (it lowers to an iterative rejection loop) and NOT the
    stream the Pallas in-kernel bootstraps draw.
    ``dtype``: table storage dtype (see :func:`freq_from_indices`).
    """
    if method == "multinomial":
        return freq_from_indices(random_indices(rng, nrep, nrec), nrec, dtype=dtype)
    if method == "poisson":
        return poisson1_freq(rng, (nrep, nrec), dtype=dtype)
    if method == "poisson_exact":
        return jax.random.poisson(rng, 1.0, (nrep, nrec)).astype(dtype)
    msg = f"unknown method {method!r}"
    raise ValueError(msg)


def resample_values(values, indices, rec_axis: int = 0):
    """Index-resample raw values: new array with leading ``rep`` axis
    (reference ``DataValuesBase.resample``, data.py:403-449)."""
    return jnp.take(values, indices, axis=rec_axis)


def _freq_weights(freq, weight, dtype):
    f = freq.astype(dtype)
    if weight is not None:
        f = f * jnp.asarray(weight, dtype=dtype)[None, :]
    return f


def resample_raw_comoments(uv, xv, freq, order: int, weight=None):
    r"""Per-replicate raw comoments via the freq-matmul.

    ``uv``: ``(R,)``; ``xv``: ``(R, *val)``; ``freq``: ``(nrep, R)``.
    Returns ``(u, xu)`` with shapes ``(order+1, nrep)`` and
    ``(order+1, nrep, *val)``.
    """
    uv = jnp.asarray(uv)
    xv = jnp.asarray(xv)
    val_shape = xv.shape[1:]
    fw = _freq_weights(freq, weight, uv.dtype)  # (nrep, R)
    # an all-zero replicate row (possible with the Poisson sampler at
    # small R, P = e^-R per row, or zero weights) must not emit 0/0 NaN
    # into every downstream bootstrap std; the safe divide gives that
    # degenerate replicate zero raw moments (-> the global mean after
    # the central recentering), the mildest finite stand-in
    wsum0 = fw.sum(axis=-1)  # (nrep,)
    wsum = jnp.where(wsum0 > 0, wsum0, 1.0)

    powers = u_power_stack(uv, order)  # (R, order+1)
    u = (fw @ powers) / wsum[:, None]  # (nrep, order+1)
    # a degenerate (masked-out) replicate still honors the raw-moment
    # contract u[0] = <u^0> = 1; higher moments stay 0
    u = u.at[:, 0].set(jnp.where(wsum0 > 0, u[:, 0], 1.0))

    xflat = xv.reshape(uv.shape[0], -1)  # (R, V)
    contrib = powers[:, :, None] * xflat[:, None, :]  # (R, order+1, V)
    xu = jnp.einsum(
        "pr,rnv->pnv", fw, contrib, preferred_element_type=fw.dtype
    ) / wsum[:, None, None]

    u = jnp.moveaxis(u, 1, 0)
    xu = jnp.moveaxis(xu, 1, 0).reshape((order + 1, freq.shape[0], *val_shape))
    return u, xu


def resample_central_comoments(uv, xv, freq, order: int, weight=None):
    r"""Per-replicate central comoments, numerically stabilized.

    Returns ``(xave, uave, du, dxdu)`` with replicate axis behind the moment
    axis: ``xave (nrep, *val)``, ``uave (nrep,)``, ``du (order+1, nrep)``,
    ``dxdu (order+1, nrep, *val)``.
    """
    uv = jnp.asarray(uv)
    xv = jnp.asarray(xv)
    val_shape = xv.shape[1:]
    w_full = jnp.ones_like(uv) if weight is None else jnp.broadcast_to(
        jnp.asarray(weight, dtype=uv.dtype), uv.shape
    )

    # global (full-sample) means as the common shift
    wtot = w_full.sum()
    ubar = (w_full * uv).sum() / wtot
    xflat = xv.reshape(uv.shape[0], -1)
    xbar = (w_full[:, None] * xflat).sum(axis=0) / wtot

    us = uv - ubar
    xs = xflat - xbar[None, :]

    u_s, xu_s = resample_raw_comoments(
        us, xs, freq, order, weight=weight
    )  # shifted-raw per rep

    uave = u_s[1] + ubar  # (nrep,)
    xave_flat = xu_s[0] + xbar[None, :]  # (nrep, V)

    # exact recentering: shifted-raw (about global mean) -> central (about per-rep mean)
    du = shift_raw_moments(u_s, u_s[1])  # (order+1, nrep); du[0]=1, du[1]=0 exactly
    x_du = shift_raw_comoments(xu_s, u_s[1][:, None])  # (order+1, nrep, V)
    dxdu = x_du - xu_s[0][None] * du[:, :, None]
    du = du.at[0].set(1.0).at[1].set(0.0)
    dxdu = dxdu.at[0].set(0.0)

    xave = xave_flat.reshape((freq.shape[0], *val_shape))
    dxdu = dxdu.reshape((order + 1, freq.shape[0], *val_shape))
    return xave, uave, du, dxdu


def resample_central_umoments_batched(uv, freq, order: int, weight=None):
    r"""Per-replicate batched central u-moments (lnΠ grid bootstrap).

    ``uv (*batch, R)``; ``freq (nrep, R)`` SHARED across the batch axes —
    a bootstrap replicate resamples whole configurations, which are joint
    across the macrostate grid (reference lnpi resampling along ``rec``,
    lnpi.py:258-286 / cmomy semantics).  Numerically stabilized like
    :func:`resample_central_comoments`: shifted raw sums about the global
    per-batch means, recentered exactly per replicate.

    Returns ``(uave (nrep, *batch), du (order+1, nrep, *batch))`` with
    ``du[0]=1, du[1]=0``.
    """
    uv = jnp.asarray(uv)
    w = (
        jnp.ones_like(uv)
        if weight is None
        else jnp.broadcast_to(jnp.asarray(weight, uv.dtype), uv.shape)
    )
    f = jnp.asarray(freq).astype(uv.dtype)  # (nrep, R)

    # global per-batch means as the common shift
    wtot = w.sum(-1)
    ubar = (w * uv).sum(-1) / wtot  # (*batch,)

    du = uv - ubar[..., None]
    p = w
    rows = [jnp.einsum("pr,...r->p...", f, p)]
    for _ in range(order):
        p = p * du
        rows.append(jnp.einsum("pr,...r->p...", f, p))
    sums = jnp.stack(rows)  # (order+1, nrep, *batch)

    # all-zero replicate rows: safe divide (see resample_raw_comoments)
    m = sums / jnp.where(sums[0] > 0, sums[0], 1.0)
    uave_r = m[1] + ubar[None]  # (nrep, *batch)
    du_r = shift_raw_moments(m, m[1])
    du_r = du_r.at[0].set(1.0).at[1].set(0.0)
    return uave_r, du_r
