"""Native C++ fast table loader vs np.loadtxt."""

import numpy as np
import pytest

from thermoextrap_tpu.native import loadtxt_fast


@pytest.fixture
def table_file(tmp_path, rng_np):
    data = np.concatenate(
        [
            rng_np.normal(scale=1e3, size=(500, 3)),
            rng_np.normal(scale=1e-7, size=(500, 3)),
        ]
    )
    path = tmp_path / "table.txt"
    with path.open("w") as f:
        f.write("# comment line\n")
        np.savetxt(f, data)
        f.write("# trailing comment\n")
    return path, data


def test_matches_numpy(table_file):
    path, data = table_file
    a = loadtxt_fast(path)
    b = np.loadtxt(path)
    np.testing.assert_allclose(a, b, rtol=5e-16)
    np.testing.assert_allclose(a, data, rtol=1e-10)


def test_single_column(tmp_path, rng_np):
    data = rng_np.normal(size=1000)
    path = tmp_path / "col.txt"
    np.savetxt(path, data)
    a = loadtxt_fast(path)
    assert a.ndim == 1
    np.testing.assert_allclose(a, data, rtol=5e-16)


def test_usecols_matches_numpy(table_file):
    path, _data = table_file
    # scalar, list-of-one, and multi-column selections follow np.loadtxt
    np.testing.assert_allclose(
        loadtxt_fast(path, usecols=1), np.loadtxt(path, usecols=1), rtol=5e-16
    )
    np.testing.assert_allclose(
        loadtxt_fast(path, usecols=[2]), np.loadtxt(path, usecols=[2]), rtol=5e-16
    )
    np.testing.assert_allclose(
        loadtxt_fast(path, usecols=[0, 2]),
        np.loadtxt(path, usecols=[0, 2]),
        rtol=5e-16,
    )


def test_usecols_out_of_range_raises(tmp_path, rng_np):
    # a single-column table must NOT silently satisfy usecols=2
    path = tmp_path / "col.txt"
    np.savetxt(path, rng_np.normal(size=50))
    with pytest.raises(Exception):  # noqa: B017 - np.loadtxt raises ValueError, fast path IndexError
        loadtxt_fast(path, usecols=2)


def test_int_and_exponent_formats(tmp_path):
    path = tmp_path / "mixed.txt"
    path.write_text("1 2.5 -3e2\n4.0E-3 +5 6.25d1\n")
    a = loadtxt_fast(path)
    np.testing.assert_allclose(
        a, [[1.0, 2.5, -300.0], [0.004, 5.0, 62.5]], rtol=1e-15
    )


def test_datawrapper_uses_fastloader(tmp_path, rng_np):
    from thermoextrap_tpu.gpr_active.active_utils import DataWrapper

    n = 400
    u = rng_np.normal(5.0, 1.0, n)
    cv = rng_np.normal(1.0, 0.2, n)
    info = np.stack([np.arange(n), np.zeros(n), u], axis=1)
    cvb = np.stack([np.arange(n), cv, np.zeros(n)], axis=1)
    np.savetxt(tmp_path / "sim_info.txt", info)
    np.savetxt(tmp_path / "cv_bias.txt", cvb)

    dw = DataWrapper(
        [str(tmp_path / "sim_info.txt")],
        [str(tmp_path / "cv_bias.txt")],
        beta=1.0,
        n_frames=n,
        cv_cols=[1, 2],
    )
    pot, x, w = dw.get_data()
    assert pot.shape[0] == x.shape[0] == w.shape[0]
    state = dw.build_state(max_order=2)
    assert state.order == 2
    assert np.isfinite(np.asarray(state.derivs())).all()
