"""thermoextrap_tpu: TPU-native thermodynamic extrapolation / interpolation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``usnistgov/thermoextrap`` (reference mounted at /root/reference):

- central/raw (co)moment reduction and bootstrap resampling as MXU-friendly
  matmul kernels (:mod:`.ops.moments`, :mod:`.ops.resample`, with fused
  Pallas variants in :mod:`.ops.moments_pallas`) replacing cmomy/numba;
- closed-form truncated-series derivative engine
  (:mod:`.models.derivatives`) replacing runtime sympy;
- Taylor extrapolation / polynomial interpolation / reweighting models
  (:mod:`.models.extrap`) including a native jax MBAR (:mod:`.models.mbar`);
- β, volume, and lnΠ ensembles (:mod:`.beta`, :mod:`.volume`,
  :mod:`.volume_idealgas`, :mod:`.lnpi`);
- adaptive/recursive interpolation trainers (:mod:`.adaptive_interp`,
  :mod:`.recursive_interp`);
- derivative-informed heteroscedastic GPR + active learning
  (:mod:`.gpr_active`) replacing GPflow/TensorFlow;
- multi-device sharding over a jax Mesh (:mod:`.parallel`).

Top-level API mirrors the reference ``__init__.py:40-111``.
"""

from . import (
    adaptive_interp,
    beta,
    compat,
    data,
    idealgas,
    io_stream,
    lnpi,
    parallel,
    pipeline,
    random,
    recursive_interp,
    stack,
    volume,
    volume_idealgas,
)
from .data import (
    DataCallback,
    DataCallbackABC,
    DataCentralMoments,
    DataCentralMomentsVals,
    DataValues,
    DataValuesCentral,
    factory_data_values,
)
from .models.derivatives import Derivatives
from .models.extrap import (
    ExtrapModel,
    ExtrapWeightedModel,
    InterpModel,
    InterpModelPiecewise,
    MBARModel,
    PerturbModel,
    StateCollection,
)

__version__ = "0.1.0"

__all__ = [
    "DataCallback",
    "DataCallbackABC",
    "DataCentralMoments",
    "DataCentralMomentsVals",
    "DataValues",
    "DataValuesCentral",
    "Derivatives",
    "ExtrapModel",
    "ExtrapWeightedModel",
    "InterpModel",
    "InterpModelPiecewise",
    "MBARModel",
    "PerturbModel",
    "StateCollection",
    "adaptive_interp",
    "beta",
    "compat",
    "data",
    "factory_data_values",
    "idealgas",
    "io_stream",
    "lnpi",
    "parallel",
    "pipeline",
    "random",
    "recursive_interp",
    "serving_export",
    "stack",
    "volume",
    "volume_idealgas",
]


def __getattr__(name):
    # lazy-load the GPR stack (sympy-heavy) like the reference lazy-loader,
    # and the AOT export module (pulls in jax.export)
    if name in ("gpr_active", "serving_export"):
        import importlib

        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    msg = f"module {__name__!r} has no attribute {name!r}"
    raise AttributeError(msg)
