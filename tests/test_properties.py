"""Property-based tests (hypothesis) for the algebraic core.

The series jet algebra (ops/series.py) and the moment conversions
(ops/convert.py) are the exact-math foundation under every derivative
the package produces (the role of sympy in the reference,
/root/reference/src/thermoextrap/models.py:102-287).  The example-based
suites pin known values; these tests pin the *algebraic identities* the
engines must satisfy for arbitrary inputs — ring laws, inverse
round-trips, shift composition, and agreement with direct numpy sample
statistics on randomly partitioned streams.

Everything runs eagerly on CPU f64 (tests/conftest.py forces x64), so
tolerances are genuine f64 slack, not accuracy gates.
"""

from __future__ import annotations

import numpy as np
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from thermoextrap_tpu.ops import convert, series  # noqa: E402

# deterministic, bounded runs on a contended CI host
COMMON = settings(max_examples=20, deadline=None, derandomize=True)


def _rng(seed):
    return np.random.default_rng(seed)


def _series(rng, k, batch=(), lead_positive=False):
    """Random length-(k+1) coefficient series with O(1) entries."""
    c = rng.uniform(-2.0, 2.0, size=(k + 1, *batch))
    if lead_positive:
        c[0] = rng.uniform(0.5, 3.0, size=batch)
    elif abs(float(np.min(np.abs(c[0]) if batch else [abs(c[0])]))) < 1e-3:
        c[0] = np.where(np.abs(c[0]) < 1e-3, 1.0, c[0])
    return jnp.asarray(c)


orders = st.integers(min_value=1, max_value=6)
seeds = st.integers(min_value=0, max_value=2**32 - 1)


# ---------------------------------------------------------------------------
# series ring laws
# ---------------------------------------------------------------------------


@COMMON
@given(seed=seeds, k=orders)
def test_series_mul_commutes_and_associates(seed, k):
    rng = _rng(seed)
    a, b, c = (_series(rng, k) for _ in range(3))
    ab = series.series_mul(a, b, order=k)
    ba = series.series_mul(b, a, order=k)
    np.testing.assert_allclose(np.asarray(ab), np.asarray(ba), rtol=1e-12, atol=1e-12)
    left = series.series_mul(ab, c, order=k)
    right = series.series_mul(a, series.series_mul(b, c, order=k), order=k)
    np.testing.assert_allclose(np.asarray(left), np.asarray(right), rtol=1e-10, atol=1e-10)


@COMMON
@given(seed=seeds, k=orders)
def test_series_div_mul_roundtrip(seed, k):
    rng = _rng(seed)
    a = _series(rng, k)
    b = _series(rng, k, lead_positive=True)
    q = series.series_div(a, b, order=k)
    back = series.series_mul(q, b, order=k)
    np.testing.assert_allclose(np.asarray(back), np.asarray(a), rtol=1e-9, atol=1e-9)


@COMMON
@given(seed=seeds, k=orders)
def test_series_inv_is_reciprocal(seed, k):
    rng = _rng(seed)
    b = _series(rng, k, lead_positive=True)
    one = np.zeros(k + 1)
    one[0] = 1.0
    prod = series.series_mul(series.series_inv(b, order=k), b, order=k)
    np.testing.assert_allclose(np.asarray(prod), one, rtol=1e-9, atol=1e-9)


@COMMON
@given(seed=seeds, k=orders, i=st.integers(min_value=0, max_value=5))
def test_series_pow_matches_repeated_mul(seed, k, i):
    rng = _rng(seed)
    a = _series(rng, k, lead_positive=True)
    expected = jnp.zeros((k + 1,)).at[0].set(1.0)
    for _ in range(i):
        expected = series.series_mul(expected, a, order=k)
    got = series.series_pow(a, i, order=k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-9, atol=1e-9)
    # negative power = inverse of positive power
    if i:
        got_neg = series.series_pow(a, -i, order=k)
        prod = series.series_mul(got, got_neg, order=k)
        one = np.zeros(k + 1)
        one[0] = 1.0
        np.testing.assert_allclose(np.asarray(prod), one, rtol=1e-8, atol=1e-8)


def _series_ddx(c):
    """Formal derivative of a normalized-coefficient series: (n+1) c[n+1]."""
    k = c.shape[0] - 1
    return jnp.stack([(n + 1) * c[n + 1] for n in range(k)], axis=0)


@COMMON
@given(seed=seeds, k=st.integers(min_value=2, max_value=6))
def test_series_log_satisfies_a_logp_eq_ap(seed, k):
    # the defining ODE of the log jet: a * (log a)' == a'
    rng = _rng(seed)
    a = _series(rng, k, lead_positive=True)
    lp = _series_ddx(series.series_log(a, order=k))
    ap = _series_ddx(a)
    prod = series.series_mul(a, lp, order=k - 1)
    np.testing.assert_allclose(np.asarray(prod), np.asarray(ap), rtol=1e-9, atol=1e-9)


@COMMON
@given(seed=seeds, k=orders)
def test_series_log_product_rule(seed, k):
    rng = _rng(seed)
    a = _series(rng, k, lead_positive=True)
    b = _series(rng, k, lead_positive=True)
    lhs = series.series_log(series.series_mul(a, b, order=k), order=k)
    rhs = series.series_log(a, order=k) + series.series_log(b, order=k)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-9, atol=1e-9)
    # and minus_log is exactly the negation
    np.testing.assert_array_equal(
        np.asarray(series.series_neg_log(a, order=k)),
        -np.asarray(series.series_log(a, order=k)),
    )


@COMMON
@given(
    seed=seeds,
    k=orders,
    s=st.floats(min_value=-3.0, max_value=3.0, allow_nan=False),
    t=st.floats(min_value=-3.0, max_value=3.0, allow_nan=False),
)
def test_series_compose_linear_is_multiplicative(seed, k, s, t):
    rng = _rng(seed)
    a = _series(rng, k)
    b = _series(rng, k)
    twice = series.series_compose_linear(series.series_compose_linear(a, s), t)
    once = series.series_compose_linear(a, s * t)
    np.testing.assert_allclose(np.asarray(twice), np.asarray(once), rtol=1e-10, atol=1e-12)
    # composition is a ring homomorphism: compose(a*b) == compose(a)*compose(b)
    lhs = series.series_compose_linear(series.series_mul(a, b, order=k), s)
    rhs = series.series_mul(
        series.series_compose_linear(a, s),
        series.series_compose_linear(b, s),
        order=k,
    )
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-9, atol=1e-9)


@COMMON
@given(seed=seeds, k=orders)
def test_derivs_coefs_roundtrip(seed, k):
    rng = _rng(seed)
    c = _series(rng, k, batch=(2,))
    back = series.coefs_from_derivs(series.derivs_from_coefs(c))
    np.testing.assert_allclose(np.asarray(back), np.asarray(c), rtol=1e-12, atol=1e-15)


# ---------------------------------------------------------------------------
# moment conversions vs direct sample statistics
# ---------------------------------------------------------------------------


def _raw_moments(x, order):
    return np.stack([np.mean(x**n) for n in range(order + 1)])


def _central_moments(x, order):
    d = x - x.mean()
    out = np.stack([np.mean(d**n) for n in range(order + 1)])
    out[0], out[1] = 1.0, 0.0
    return out


samples = st.integers(min_value=3, max_value=400)


@COMMON
@given(seed=seeds, k=orders, n=samples)
def test_central_from_raw_matches_sample_oracle(seed, k, n):
    rng = _rng(seed)
    x = rng.normal(1.5, 0.7, size=n)
    u = _raw_moments(x, k)
    for xp in (np, jnp):
        du = np.asarray(convert.central_from_raw(xp.asarray(u), xp=xp))
        np.testing.assert_allclose(du, _central_moments(x, k), rtol=1e-9, atol=1e-12)


@COMMON
@given(seed=seeds, k=orders)
def test_raw_central_roundtrip(seed, k):
    rng = _rng(seed)
    x = rng.normal(-0.8, 1.2, size=200)
    u = _raw_moments(x, k)
    for xp in (np, jnp):
        du = convert.central_from_raw(xp.asarray(u), xp=xp)
        u_back = np.asarray(convert.raw_from_central(du, xp.asarray(u[1]), xp=xp))
        np.testing.assert_allclose(u_back, u, rtol=1e-9, atol=1e-12)


@COMMON
@given(
    seed=seeds,
    k=orders,
    d1=st.floats(min_value=-2.0, max_value=2.0, allow_nan=False),
    d2=st.floats(min_value=-2.0, max_value=2.0, allow_nan=False),
)
def test_shift_raw_moments_composes(seed, k, d1, d2):
    rng = _rng(seed)
    x = rng.normal(0.3, 1.1, size=100)
    u = jnp.asarray(_raw_moments(x, k))
    twice = convert.shift_raw_moments(convert.shift_raw_moments(u, d1), d2)
    once = convert.shift_raw_moments(u, d1 + d2)
    np.testing.assert_allclose(np.asarray(twice), np.asarray(once), rtol=1e-8, atol=1e-10)


@COMMON
@given(seed=seeds, k=orders, n=samples)
def test_central_comoments_from_raw_matches_sample_oracle(seed, k, n):
    rng = _rng(seed)
    u_s = rng.normal(2.0, 0.9, size=n)
    x_s = 0.4 * u_s + rng.normal(0.0, 0.5, size=n)
    u = _raw_moments(u_s, k)
    xu = np.stack([np.mean(x_s * u_s**m) for m in range(k + 1)])
    xave, du, dxdu = convert.central_comoments_from_raw(
        jnp.asarray(u), jnp.asarray(xu)
    )
    dm = u_s - u_s.mean()
    dx = x_s - x_s.mean()
    oracle = np.stack([np.mean(dx * dm**m) for m in range(k + 1)])
    oracle[0] = 0.0
    np.testing.assert_allclose(float(xave), x_s.mean(), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(du), _central_moments(u_s, k), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dxdu), oracle, rtol=1e-8, atol=1e-11)


@COMMON
@given(seed=seeds, k=orders)
def test_x_is_u_shift_trick(seed, k):
    rng = _rng(seed)
    u_s = rng.normal(1.0, 0.6, size=150)
    u = _raw_moments(u_s, k + 1)
    xu = np.stack([np.mean(u_s * u_s**m) for m in range(k + 1)])
    rebuilt = np.asarray(convert.u_from_xu_when_x_is_u(jnp.asarray(xu)))
    np.testing.assert_allclose(rebuilt, u, rtol=1e-12, atol=1e-15)


# ---------------------------------------------------------------------------
# exact merge of randomly partitioned streams
# ---------------------------------------------------------------------------


@COMMON
@given(
    seed=seeds,
    k=orders,
    cuts=st.lists(st.integers(min_value=2, max_value=80), min_size=2, max_size=6),
    weighted=st.booleans(),
)
def test_merge_central_comoments_matches_one_shot(seed, k, cuts, weighted):
    rng = _rng(seed)
    n = sum(cuts)
    u_s = rng.normal(0.5, 1.3, size=n)
    x_s = np.sin(u_s) + rng.normal(0.0, 0.2, size=n)
    w = rng.uniform(0.2, 2.0, size=n) if weighted else np.ones(n)

    def stats(sl):
        us, xs, ws = u_s[sl], x_s[sl], w[sl]
        wt = ws.sum()
        um = (ws * us).sum() / wt
        xm = (ws * xs).sum() / wt
        du = np.stack([(ws * (us - um) ** m).sum() / wt for m in range(k + 1)])
        dxdu = np.stack(
            [(ws * (xs - xm) * (us - um) ** m).sum() / wt for m in range(k + 1)]
        )
        du[0], du[1], dxdu[0] = 1.0, 0.0, 0.0
        return xm, um, du, dxdu, wt

    parts = []
    start = 0
    for c in cuts:
        parts.append(stats(slice(start, start + c)))
        start += c
    xave = jnp.asarray(np.stack([p[0] for p in parts]))
    uave = jnp.asarray(np.stack([p[1] for p in parts]))
    du = jnp.asarray(np.stack([p[2] for p in parts], axis=1))
    dxdu = jnp.asarray(np.stack([p[3] for p in parts], axis=1))
    wsum = jnp.asarray(np.stack([p[4] for p in parts]))

    xm, um, dum, dxdum, wt = convert.merge_central_comoments(
        xave, uave, du, dxdu, wsum
    )
    exp_xm, exp_um, exp_du, exp_dxdu, exp_wt = stats(slice(None))
    np.testing.assert_allclose(float(wt), exp_wt, rtol=1e-12)
    np.testing.assert_allclose(float(um), exp_um, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(float(xm), exp_xm, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(dum), exp_du, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dxdum), exp_dxdu, rtol=1e-8, atol=1e-10)


# ---------------------------------------------------------------------------
# XLA reduction / bootstrap paths vs per-replicate numpy statistics
# ---------------------------------------------------------------------------


@COMMON
@given(
    seed=seeds,
    k=orders,
    n=st.integers(min_value=4, max_value=150),
    nb=st.integers(min_value=0, max_value=2),
    v=st.integers(min_value=1, max_value=3),
    weighted=st.booleans(),
)
def test_reduce_central_comoments_matches_oracle(seed, k, n, nb, v, weighted):
    from thermoextrap_tpu.ops.moments import reduce_central_comoments

    rng = _rng(seed)
    batch = tuple(rng.integers(1, 3, size=nb))
    uv = rng.normal(1.0, 0.8, size=(*batch, n))
    xv = rng.normal(-0.5, 1.1, size=(*batch, n, v))
    w = rng.uniform(0.1, 2.0, size=(*batch, n)) if weighted else None

    xave, uave, du, dxdu = reduce_central_comoments(
        jnp.asarray(uv), jnp.asarray(xv), k, weight=None if w is None else jnp.asarray(w)
    )

    wo = np.ones((*batch, n)) if w is None else w
    wt = wo.sum(-1)
    um = (wo * uv).sum(-1) / wt
    xm = (wo[..., None] * xv).sum(-2) / wt[..., None]
    duo = np.stack(
        [(wo * (uv - um[..., None]) ** m).sum(-1) / wt for m in range(k + 1)]
    )
    dxduo = np.stack(
        [
            (
                wo[..., None]
                * (xv - xm[..., None, :])
                * ((uv - um[..., None]) ** m)[..., None]
            ).sum(-2)
            / wt[..., None]
            for m in range(k + 1)
        ]
    )
    duo[0], duo[1], dxduo[0] = 1.0, 0.0, 0.0
    np.testing.assert_allclose(np.asarray(uave), um, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(xave), xm, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(du), duo, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dxdu), dxduo, rtol=1e-8, atol=1e-10)


@COMMON
@given(
    seed=seeds,
    k=orders,
    n=st.integers(min_value=4, max_value=120),
    nrep=st.integers(min_value=1, max_value=8),
    weighted=st.booleans(),
)
def test_resample_central_comoments_matches_oracle(seed, k, n, nrep, weighted):
    from thermoextrap_tpu.ops.resample import resample_central_comoments

    rng = _rng(seed)
    uv = rng.normal(2.0, 0.7, size=n)
    xv = rng.normal(0.0, 1.0, size=(n, 2))
    w = rng.uniform(0.2, 1.5, size=n) if weighted else None
    # multinomial bootstrap counts; every row draws n samples so no
    # zero-weight replicates occur
    freq = rng.multinomial(n, np.ones(n) / n, size=nrep)

    xave, uave, du, dxdu = resample_central_comoments(
        jnp.asarray(uv),
        jnp.asarray(xv),
        jnp.asarray(freq),
        k,
        weight=None if w is None else jnp.asarray(w),
    )

    wo = np.ones(n) if w is None else w
    for r in range(nrep):
        wr = freq[r] * wo
        wt = wr.sum()
        um = (wr * uv).sum() / wt
        xm = (wr[:, None] * xv).sum(0) / wt
        duo = np.stack([(wr * (uv - um) ** m).sum() / wt for m in range(k + 1)])
        dxduo = np.stack(
            [
                (wr[:, None] * (xv - xm) * ((uv - um) ** m)[:, None]).sum(0) / wt
                for m in range(k + 1)
            ]
        )
        duo[0], duo[1], dxduo[0] = 1.0, 0.0, 0.0
        np.testing.assert_allclose(float(uave[r]), um, rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(xave)[r], xm, rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(du)[:, r], duo, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(dxdu)[:, r], dxduo, rtol=1e-7, atol=1e-9
        )


@COMMON
@given(
    seed=seeds,
    k=orders,
    n=st.integers(min_value=4, max_value=100),
    nrep=st.integers(min_value=1, max_value=6),
    nb=st.integers(min_value=1, max_value=2),
)
def test_resample_umoments_batched_matches_oracle(seed, k, n, nrep, nb):
    from thermoextrap_tpu.ops.resample import resample_central_umoments_batched

    rng = _rng(seed)
    batch = tuple(rng.integers(1, 4, size=nb))
    uv = rng.normal(-1.0, 0.9, size=(*batch, n))
    freq = rng.multinomial(n, np.ones(n) / n, size=nrep)

    uave, du = resample_central_umoments_batched(
        jnp.asarray(uv), jnp.asarray(freq), k
    )
    assert uave.shape == (nrep, *batch)
    assert du.shape == (k + 1, nrep, *batch)

    flat = uv.reshape(-1, n)
    for r in range(nrep):
        wr = freq[r].astype(float)
        wt = wr.sum()
        um = (flat * wr).sum(-1) / wt
        duo = np.stack(
            [(wr * (flat - um[:, None]) ** m).sum(-1) / wt for m in range(k + 1)]
        )
        duo[0], duo[1] = 1.0, 0.0
        np.testing.assert_allclose(
            np.asarray(uave)[r].ravel(), um, rtol=1e-9, atol=1e-11
        )
        np.testing.assert_allclose(
            np.asarray(du)[:, r].reshape(k + 1, -1), duo, rtol=1e-7, atol=1e-9
        )
