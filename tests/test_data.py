"""Data-layer consistency matrix (reference tests/test_data.py role):
every construction path must yield identical moments and derivatives."""

import jax
import numpy as np
import pytest

import thermoextrap_tpu as xtpu
from thermoextrap_tpu import beta as beta_xpan

ORDER = 4
BETA0 = 1.0


@pytest.fixture(scope="module")
def vals():
    rng = np.random.default_rng(0)
    n, v = 64, 2
    u = rng.normal(loc=2.0, size=n)
    x = rng.normal(loc=1.0, size=(n, v))
    return u, x


def test_raw_vs_central_derivs(vals):
    u, x = vals
    d_raw = xtpu.DataValues.from_vals(x, u, ORDER, central=False)
    d_cen = xtpu.DataValuesCentral.from_vals(x, u, ORDER)
    m_raw = beta_xpan.factory_extrapmodel(BETA0, d_raw)
    m_cen = beta_xpan.factory_extrapmodel(BETA0, d_cen)
    np.testing.assert_allclose(
        np.asarray(m_raw.derivs()), np.asarray(m_cen.derivs()), rtol=1e-8
    )


def test_values_vs_moment_backed(vals):
    u, x = vals
    d_val = xtpu.DataCentralMomentsVals.from_vals(x, u, ORDER)
    d_mom = xtpu.DataCentralMoments.from_vals(x, u, ORDER)
    for a, b in zip(d_val.derivs_args, d_mom.derivs_args):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-12)


def test_from_raw_matches_from_vals(vals):
    u, x = vals
    d_val = xtpu.DataValues.from_vals(x, u, ORDER, central=False)
    d_raw = xtpu.DataCentralMoments.from_raw(
        d_val.u[:, 0], d_val.xu, central=False
    )
    np.testing.assert_allclose(
        np.asarray(d_raw.u), np.asarray(d_val.u), rtol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(d_raw.xu), np.asarray(d_val.xu), rtol=1e-7
    )
    # and central views agree with the two-pass direct computation
    d_cen = xtpu.DataCentralMoments.from_vals(x, u, ORDER)
    np.testing.assert_allclose(
        np.asarray(d_raw.dxdu), np.asarray(d_cen.dxdu), rtol=1e-6, atol=1e-10
    )


def test_x_is_u_consistency(vals):
    """u-observable via x_is_u shift == direct reduction of u as x."""
    u, _ = vals
    d = xtpu.DataValues.from_vals(None, u, ORDER + 1, central=False, x_is_u=True)
    m = beta_xpan.factory_extrapmodel(BETA0, d, name="u_ave", order=ORDER)
    # compare against x_ave with x = u (explicit copy)
    d2 = xtpu.DataValues.from_vals(u.copy(), u, ORDER, central=False)
    m2 = beta_xpan.factory_extrapmodel(BETA0, d2, name="x_ave")
    np.testing.assert_allclose(
        np.asarray(m.derivs(order=ORDER)),
        np.asarray(m2.derivs(order=ORDER)),
        rtol=1e-8,
    )


class TestResample:
    nrep = 8

    def test_values_resample_consistency(self, vals):
        """Value-resampled and moment-resampled paths share indices -> equal."""
        u, x = vals
        indices = np.asarray(
            jax.random.randint(jax.random.key(5), (self.nrep, u.shape[0]), 0, u.shape[0])
        )

        d_val = xtpu.DataValuesCentral.from_vals(x, u, ORDER)
        r_val = d_val.resample({"indices": indices})

        d_cmv = xtpu.DataCentralMomentsVals.from_vals(x, u, ORDER)
        r_cmv = d_cmv.resample({"indices": indices})

        m1 = beta_xpan.factory_extrapmodel(BETA0, r_val)
        m2 = beta_xpan.factory_extrapmodel(BETA0, r_cmv)
        np.testing.assert_allclose(
            np.asarray(m1.derivs()), np.asarray(m2.derivs()), rtol=1e-7, atol=1e-10
        )

    def test_model_resample(self, vals):
        u, x = vals
        d = xtpu.DataValues.from_vals(x, u, ORDER, central=False)
        m = beta_xpan.factory_extrapmodel(BETA0, d)
        mr = m.resample({"nrep": self.nrep})
        pred = np.asarray(mr.predict(1.2))
        assert pred.shape == (self.nrep, x.shape[1])
        # replicate spread brackets the point estimate
        p0 = np.asarray(m.predict(1.2))
        assert np.all(np.abs(pred.mean(0) - p0) < 10 * pred.std(0) + 1e-8)


def test_weighted_reduction_equals_repeats():
    """Integer weights == literally repeated samples."""
    rng = np.random.default_rng(2)
    u = rng.normal(size=10)
    x = rng.normal(size=(10, 1))
    w = rng.integers(1, 4, size=10)
    u_rep = np.repeat(u, w)
    x_rep = np.repeat(x, w, axis=0)

    d_w = xtpu.DataValuesCentral.from_vals(x, u, ORDER, weight=w.astype(float))
    d_r = xtpu.DataValuesCentral.from_vals(x_rep, u_rep, ORDER)
    for a, b in zip(d_w.derivs_args, d_r.derivs_args):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-12)


def test_pytree_roundtrip(vals):
    u, x = vals
    d = xtpu.DataValues.from_vals(x, u, ORDER, central=False)
    leaves, treedef = jax.tree_util.tree_flatten(d)
    d2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert d2.order == d.order
    np.testing.assert_array_equal(np.asarray(d2.uv), np.asarray(d.uv))


def test_reduce_merges_blocks(vals):
    """Pooling per-block moments == reducing the concatenated samples
    (reference DataCentralMoments.reduce, data.py:973-998)."""
    import jax.numpy as jnp

    u, x = vals
    nblock, blk = 4, len(u) // 4
    u_b = u[: nblock * blk].reshape(nblock, blk)
    x_b = x[: nblock * blk].reshape(nblock, blk, -1)

    d_blocks = xtpu.DataCentralMoments.from_vals(x_b, u_b, ORDER)
    pooled = d_blocks.reduce(axis=0)

    d_all = xtpu.DataCentralMoments.from_vals(
        x_b.reshape(-1, x.shape[1]), u_b.reshape(-1), ORDER
    )
    np.testing.assert_allclose(
        np.asarray(pooled.xave), np.asarray(d_all.xave), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(pooled.uave), np.asarray(d_all.uave), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(pooled.du), np.asarray(d_all.du), rtol=1e-10, atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(pooled.dxdu), np.asarray(d_all.dxdu), rtol=1e-10, atol=1e-14
    )
    assert float(pooled.wsum) == nblock * blk


class TestMomentBlockResample:
    """Moment-backed block bootstrap (reference DataCentralMoments.resample
    via cmomy resample_and_reduce, reference data.py:1000-1055) — validated
    by the reference's own shared-sampler consistency technique (reference
    tests/test_data.py:94): blocks partition one sample set, the value-level
    freq repeats each block count over its samples, paths must agree."""

    nrep, nblock = 6, 8

    def _blocks(self, vals, weight=None):
        u, x = vals
        blk = len(u) // self.nblock
        u_b = u[: self.nblock * blk].reshape(self.nblock, blk)
        x_b = x[: self.nblock * blk].reshape(self.nblock, blk, -1)
        w_b = None if weight is None else weight[: self.nblock * blk].reshape(
            self.nblock, blk
        )
        return u_b, x_b, w_b, blk

    def _freq(self, seed=7):
        from thermoextrap_tpu.ops.resample import freq_from_indices, random_indices

        idx = random_indices(jax.random.key(seed), self.nrep, self.nblock)
        return np.asarray(freq_from_indices(idx, self.nblock))

    def _assert_equal(self, r_mom, r_val):
        np.testing.assert_allclose(
            np.asarray(r_mom.xave), np.asarray(r_val.xave), rtol=1e-10, atol=1e-13
        )
        np.testing.assert_allclose(
            np.asarray(r_mom.uave), np.asarray(r_val.uave), rtol=1e-10, atol=1e-13
        )
        np.testing.assert_allclose(
            np.asarray(r_mom.du), np.asarray(r_val._du_norm), rtol=1e-9, atol=1e-13
        )
        np.testing.assert_allclose(
            np.asarray(r_mom.dxdu), np.asarray(r_val.dxdu), rtol=1e-9, atol=1e-13
        )
        np.testing.assert_allclose(
            np.asarray(r_mom.wsum), np.asarray(r_val.wsum), rtol=1e-12
        )

    def test_matches_values_bootstrap(self, vals):
        u_b, x_b, _, blk = self._blocks(vals)
        freq = self._freq()
        d_blocks = xtpu.DataCentralMoments.from_vals(x_b, u_b, ORDER)
        r_mom = d_blocks.resample({"freq": freq})
        assert r_mom.wsum.shape == (self.nrep,)

        freq_vals = np.repeat(freq, blk, axis=1)
        r_val = xtpu.DataCentralMoments.from_resample_vals(
            x_b.reshape(-1, x_b.shape[-1]), u_b.reshape(-1), ORDER,
            {"freq": freq_vals},
        )
        self._assert_equal(r_mom, r_val)

    def test_weighted_blocks(self, vals):
        rng = np.random.default_rng(11)
        w = rng.uniform(0.5, 2.0, size=len(vals[0]))
        u_b, x_b, w_b, blk = self._blocks(vals, weight=w)
        freq = self._freq(seed=9)
        d_blocks = xtpu.DataCentralMoments.from_vals(x_b, u_b, ORDER, weight=w_b)
        r_mom = d_blocks.resample({"freq": freq})

        freq_vals = np.repeat(freq, blk, axis=1)
        r_val = xtpu.DataCentralMoments.from_resample_vals(
            x_b.reshape(-1, x_b.shape[-1]), u_b.reshape(-1), ORDER,
            {"freq": freq_vals}, weight=w_b.reshape(-1),
        )
        self._assert_equal(r_mom, r_val)

    def test_x_is_u(self, vals):
        u, _ = vals
        blk = len(u) // self.nblock
        u_b = u[: self.nblock * blk].reshape(self.nblock, blk)
        freq = self._freq(seed=3)
        d_blocks = xtpu.DataCentralMoments.from_vals(None, u_b, ORDER, x_is_u=True)
        r_mom = d_blocks.resample({"freq": freq})

        freq_vals = np.repeat(freq, blk, axis=1)
        r_val = xtpu.DataCentralMoments.from_resample_vals(
            None, u_b.reshape(-1), ORDER, {"freq": freq_vals}, x_is_u=True
        )
        self._assert_equal(r_mom, r_val)

    def test_axis_and_kept_batch(self, vals):
        """Blocks on axis=1; the kept leading batch axis must survive and
        every kept row must equal its own flat resample."""
        u, x = vals
        blk = len(u) // self.nblock
        # two independent "grids" from halves of the sample set
        u2 = np.stack([u[: 32], u[32:]], axis=0)[:, : self.nblock // 2 * 8]
        nb2 = 4
        u_b = u2.reshape(2, nb2, -1)
        x_b = u_b[..., None] * 0.5 + 1.0
        freq = self._freq(seed=13)[:, :nb2]
        d = xtpu.DataCentralMoments.from_vals(x_b, u_b, ORDER)
        assert d.wsum.shape == (2, nb2)
        r = d.resample({"freq": freq}, axis=1)
        assert r.wsum.shape == (self.nrep, 2)
        for g in range(2):
            d_g = xtpu.DataCentralMoments.from_vals(x_b[g], u_b[g], ORDER)
            r_g = d_g.resample({"freq": freq})
            np.testing.assert_allclose(
                np.asarray(r.dxdu[:, :, g]), np.asarray(r_g.dxdu),
                rtol=1e-12,
            )
            np.testing.assert_allclose(
                np.asarray(r.wsum[:, g]), np.asarray(r_g.wsum), rtol=1e-12
            )

    def test_guards(self, vals):
        u, x = vals
        d0 = xtpu.DataCentralMoments.from_vals(x, u, ORDER)  # scalar batch
        with pytest.raises(ValueError, match="block batch axis"):
            d0.resample({"nrep": 4})

    def test_xalpha_blocks(self, vals):
        """Deriv-axis (xalpha) states reduce AND block-bootstrap exactly:
        the derivative columns ride the merge as value columns."""
        u, x = vals
        rng = np.random.default_rng(5)
        blk = len(u) // self.nblock
        n = self.nblock * blk
        # xv (rec, deriv+1, val): derivative columns are just more data
        xa = rng.normal(1.0, 0.5, (n, ORDER + 1, x.shape[1]))
        u_b = u[:n].reshape(self.nblock, blk)
        x_b = xa.reshape(self.nblock, blk, ORDER + 1, x.shape[1])

        d_blocks = xtpu.DataCentralMoments.from_vals(
            x_b, u_b, ORDER, xalpha=True
        )
        pooled = d_blocks.reduce(axis=0)
        d_all = xtpu.DataCentralMoments.from_vals(
            xa, u[:n], ORDER, xalpha=True
        )
        np.testing.assert_allclose(
            np.asarray(pooled.xave), np.asarray(d_all.xave), rtol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(pooled.dxdu), np.asarray(d_all.dxdu),
            rtol=1e-9, atol=1e-13,
        )
        np.testing.assert_allclose(
            np.asarray(pooled._du_norm), np.asarray(d_all._du_norm),
            rtol=1e-9, atol=1e-13,
        )

        freq = self._freq(seed=17)
        r_mom = d_blocks.resample({"freq": freq})
        assert r_mom.wsum.shape == (self.nrep,)
        assert r_mom.xave.shape == (ORDER + 1, self.nrep, x.shape[1])
        assert r_mom.dxdu.shape == (
            ORDER + 1, ORDER + 1, self.nrep, x.shape[1],
        )
        # oracle: per-replicate weighted one-shot reduction with the freq
        # expanded to sample weights — loop the replicates explicitly so
        # the oracle is the INDEPENDENT weighted one-shot reduction, not
        # the same freq-matmul engine under test (from_resample_vals
        # supports xalpha since round 5 and is gated separately in
        # test_from_resample_vals_xalpha)
        for rep in range(self.nrep):
            w_vals = np.repeat(freq[rep].astype(np.float64), blk)
            if w_vals.sum() == 0:
                continue
            d_r = xtpu.DataCentralMoments.from_vals(
                xa, u[:n], ORDER, xalpha=True, weight=w_vals
            )
            np.testing.assert_allclose(
                np.asarray(r_mom.xave[:, rep]), np.asarray(d_r.xave),
                rtol=1e-9, atol=1e-13,
            )
            np.testing.assert_allclose(
                np.asarray(r_mom.dxdu[:, :, rep]), np.asarray(d_r.dxdu),
                rtol=1e-8, atol=1e-12,
            )
            np.testing.assert_allclose(
                float(r_mom.wsum[rep]), float(d_r.wsum), rtol=1e-12
            )

    def test_jit_composes(self, vals):
        """resample is traceable: same result under jit with a static sampler."""
        u_b, x_b, _, _ = self._blocks(vals)
        freq = self._freq(seed=21)
        d_blocks = xtpu.DataCentralMoments.from_vals(x_b, u_b, ORDER)

        def f(d, fq):
            r = d.resample({"freq": fq})
            return r.dxdu, r.wsum

        a0, w0 = f(d_blocks, freq)
        a1, w1 = jax.jit(f)(d_blocks, freq)
        np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(w0), np.asarray(w1), rtol=1e-12)


def test_from_data_matches_from_vals(vals):
    """Reference-layout (trailing (xmom, umom)) constructor parity
    (reference data.py:1216-1283)."""
    u, x = vals
    d_ref = xtpu.DataCentralMoments.from_vals(x, u, ORDER)
    v = x.shape[1]
    # assemble the cmomy-layout tensor: (val, 2, order+1)
    data = np.zeros((v, 2, ORDER + 1))
    data[:, 0, 0] = len(u)
    data[:, 1, 0] = np.asarray(d_ref.xave)
    data[:, 0, 1] = float(d_ref.uave)
    for j in range(2, ORDER + 1):
        data[:, 0, j] = float(np.asarray(d_ref.du).reshape(ORDER + 1, -1)[j, 0])
    for j in range(1, ORDER + 1):
        data[:, 1, j] = np.asarray(d_ref.dxdu)[j]
    d = xtpu.DataCentralMoments.from_data(data, val_ndim=1, central=True)
    for a, b in zip(d.derivs_args, d_ref.derivs_args):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-12)
    # raw view agrees too
    np.testing.assert_allclose(np.asarray(d.xu), np.asarray(d_ref.xu), rtol=1e-6)
    assert int(d.wsum) == len(u)


def test_from_data_x_is_u(vals):
    """x_is_u from_data = the reference's moments_to_comoments shift."""
    u, _ = vals
    d_ref = xtpu.DataCentralMoments.from_vals(None, u, ORDER, x_is_u=True)
    data = np.zeros(ORDER + 2)  # [w, <u>, <du^2> .. <du^{ORDER+1}>]
    data[0] = len(u)
    data[1] = float(d_ref.uave)
    du_full = np.asarray(
        xtpu.DataValues.from_vals(None, u, ORDER + 1, x_is_u=True, central=True).du
    )
    data[2:] = du_full[2 : ORDER + 2]
    d = xtpu.DataCentralMoments.from_data(data, x_is_u=True, central=True)
    assert d.order == ORDER
    for a, b in zip(d.derivs_args, d_ref.derivs_args):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-12)


def test_cmom_from_data_round_trip(vals):
    """cmom()/rmom() emit the reference cmomy layout: from_data(d.cmom())
    reconstructs the state exactly (reference cmom/rmom, data.py:845-852)."""
    u, x = vals
    d = xtpu.DataCentralMoments.from_vals(x, u, ORDER)
    t = np.asarray(d.cmom())
    assert t.shape == (x.shape[1], 2, ORDER + 1)
    back = xtpu.DataCentralMoments.from_data(t, val_ndim=1, central=True)
    for a, b in zip(back.derivs_args, d.derivs_args):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    assert float(back.wsum) == float(d.wsum)

    # rmom carries the raw views with the weight in slot [0, 0]
    r = np.asarray(d.rmom())
    np.testing.assert_allclose(r[..., 0, 0], float(d.wsum))
    np.testing.assert_allclose(
        np.moveaxis(r[..., 1, :], -1, 0), np.asarray(d.xu), rtol=1e-12
    )
    np.testing.assert_allclose(
        r[0, 0, 1:], np.asarray(d.u).reshape(ORDER + 1, -1)[1:, 0], rtol=1e-12
    )


def test_cmom_round_trip_x_is_u(vals):
    u, _ = vals
    d = xtpu.DataCentralMoments.from_vals(None, u, ORDER)
    vec = np.asarray(d.cmom())
    assert vec.shape == (ORDER + 2,)  # [w, <u>, <du^2> .. <du^{ORDER+1}>]
    back = xtpu.DataCentralMoments.from_data(vec, x_is_u=True, central=True)
    assert back.order == ORDER
    for a, b in zip(back.derivs_args, d.derivs_args):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    r = np.asarray(d.rmom())
    np.testing.assert_allclose(r[0], float(d.wsum))
    np.testing.assert_allclose(r[1:], np.asarray(d.u)[1:], rtol=1e-12)


def test_from_ave_central_xalpha_round_trip(vals):
    """from_ave_central with a deriv axis must reproduce the from_vals
    state exactly — the du pad convention previously diverged across
    constructors and the xu view silently clamped the deriv index."""
    u, _ = vals
    rng = np.random.default_rng(23)
    order = 3
    xva = rng.normal(1.0, 0.3, (len(u), order + 1, 2))
    d = xtpu.DataCentralMoments.from_vals(xva, u, order, xalpha=True)
    back = xtpu.DataCentralMoments.from_ave_central(
        d.xave, d.uave, d.du, d.dxdu, wsum=d.wsum, xalpha=True, central=True
    )
    assert back.val_ndim == d.val_ndim == 1
    for a, b in zip(back.derivs_args, d.derivs_args):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    # the raw views (the previously broken path): xu keeps the deriv axis
    assert back.xu.shape == d.xu.shape == (order + 1, order + 1, 2)
    np.testing.assert_allclose(
        np.asarray(back.xu), np.asarray(d.xu), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(back.u), np.asarray(d.u), rtol=1e-12)


def test_from_resample_vals_xalpha_needs_xv(vals):
    """xalpha + x_is_u / xv=None is rejected loudly (not a cryptic
    moveaxis axis error)."""
    u, _ = vals
    with pytest.raises(ValueError, match="meaningless with x_is_u"):
        xtpu.DataCentralMoments.from_resample_vals(
            None, u, 2, {"nrep": 4}, xalpha=True, rng=0
        )


def test_from_resample_vals_xalpha(vals):
    """Deriv-axis bootstrap through the freq-matmul path: replicates equal
    per-replicate weighted one-shot reductions (round 5 — previously a
    NotImplementedError guard)."""
    import jax

    from thermoextrap_tpu.ops.resample import freq_from_indices, random_indices

    u, _ = vals
    rng = np.random.default_rng(8)
    n, v = len(u), 2
    xa = rng.normal(1.0, 0.5, (n, ORDER + 1, v))
    nrep = 5
    freq = np.asarray(
        freq_from_indices(random_indices(jax.random.key(2), nrep, n), n)
    )
    d = xtpu.DataCentralMoments.from_resample_vals(
        xa, u, ORDER, {"freq": freq}, xalpha=True
    )
    assert d.xalpha and d.val_ndim == 1
    assert d.xave.shape == (ORDER + 1, nrep, v)
    assert d.dxdu.shape == (ORDER + 1, ORDER + 1, nrep, v)
    for rep in range(nrep):
        d_r = xtpu.DataCentralMoments.from_vals(
            xa, u, ORDER, xalpha=True, weight=freq[rep].astype(np.float64)
        )
        np.testing.assert_allclose(
            np.asarray(d.xave[:, rep]), np.asarray(d_r.xave),
            rtol=1e-9, atol=1e-13,
        )
        np.testing.assert_allclose(
            np.asarray(d.dxdu[:, :, rep]), np.asarray(d_r.dxdu),
            rtol=1e-8, atol=1e-12,
        )


def test_alcbrute_bounded_default():
    """UpdateALCbrute must default to a bounded candidate scan (the full
    O(grid^2) sweep is opt-in via n_candidates=None)."""
    from thermoextrap_tpu.gpr_active import active_utils as au

    assert au.UpdateALCbrute(rng=0).n_candidates == 20
    assert au.UpdateALCbrute(rng=0, n_candidates=None).n_candidates is None
