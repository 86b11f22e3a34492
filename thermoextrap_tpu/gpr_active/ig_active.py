"""Ideal-gas harnesses for GP / active-learning tests
(TPU-native rebuild of /root/reference/src/thermoextrap/gpr_active/
ig_active.py — the "fake simulator" used by the reference test suite)."""

from __future__ import annotations

import numpy as np

from .. import beta as xpan_beta
from .. import idealgas
from ..data import DataCentralMomentsVals
from ..utils.random import validate_rng
from .active_utils import DataWrapper

__all__ = ["IG_DataWrapper", "SimulateIG", "extrap_IG", "multiOutput_extrap_IG"]


def extrap_IG(beta, rng=None, nconfig: int = 10_000, npart: int = 1_000, order: int = 3):
    """Extrapolation state on fresh IG data (reference ig_active.py:28-35)."""
    y, u = idealgas.generate_data((nconfig, npart), beta, rng=validate_rng(rng))
    data = DataCentralMomentsVals.from_vals(
        np.asarray(y)[:, None], np.asarray(u), order=order
    )
    return xpan_beta.factory_extrapmodel(beta, data)


def multiOutput_extrap_IG(beta, rng=None, nconfig: int = 10_000, npart: int = 1_000):  # noqa: N802
    """Two-output (x, x^2) IG state (reference ig_active.py:38-50)."""
    positions = np.asarray(
        idealgas.x_sample((nconfig, npart), beta, rng=validate_rng(rng))
    )
    y = positions.mean(axis=-1)
    ysq = (positions**2).mean(axis=-1)
    u = positions.sum(axis=-1)
    data = DataCentralMomentsVals.from_vals(
        np.stack([y, ysq], axis=1), u, order=3
    )
    return xpan_beta.factory_extrapmodel(beta, data)


class IG_DataWrapper(DataWrapper):  # noqa: N801 - reference name
    """Analytic 'simulation': fresh IG data at each request
    (reference ig_active.py:53-87)."""

    def __init__(self, beta, rng=None, nconfig: int = 10_000, npart: int = 1_000) -> None:
        self.beta = float(beta)
        self.rng = validate_rng(rng)
        self.nconfig = nconfig
        self.npart = npart

    def load_U_info(self):  # noqa: N802
        raise NotImplementedError

    def load_CV_info(self):  # noqa: N802
        raise NotImplementedError

    def load_x_info(self):
        raise NotImplementedError

    def get_data(self):
        import jax

        self.rng, sub = jax.random.split(self.rng)
        x, u = idealgas.generate_data((self.nconfig, self.npart), self.beta, rng=sub)
        u = np.asarray(u)
        return u, np.asarray(x)[:, None], np.ones_like(u)

    def build_state(self, all_data=None, max_order: int = 6):
        if all_data is None:
            all_data = self.get_data()
        u, x, _w = all_data
        data = DataCentralMomentsVals.from_vals(x, u, order=max_order)
        return xpan_beta.factory_extrapmodel(self.beta, data)


class SimulateIG:
    """Fake simulator returning fresh analytic IG data
    (reference ig_active.py:89-99)."""

    def __init__(self, sim_func=None, nconfig: int = 10_000, npart: int = 1_000) -> None:
        self.sim_func = sim_func
        self.nconfig = nconfig
        self.npart = npart
        self._counter = 0

    def run_sim(self, unused, beta, n_repeats=None, **_kws):
        del unused
        self._counter += 1
        return IG_DataWrapper(
            beta, rng=self._counter, nconfig=self.nconfig, npart=self.npart
        )
