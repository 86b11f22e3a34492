"""Import-path parity with the reference package.

A reference user ports code by swapping ``thermoextrap`` →
``thermoextrap_tpu``; every public (non-underscore, module-level) name the
reference defines must therefore resolve at the SAME module path here —
either as the real implementation or as a documented re-export/alias
(e.g. kernel factories live in ``gpr_active.kernels`` but re-export from
``gpr_active.active_utils``, the reference's home for them).

Names deliberately dropped are pinned in DROPPED with their replacement,
so any future reference-surface audit sees an explicit decision, not an
omission.  Reference inventory generated from the AST of
/root/reference/src/thermoextrap (v0.6.0), excluding ``legacy/`` and
``core/`` (deprecated re-export shims).
"""

from __future__ import annotations

import importlib

import numpy as np
import pytest

# our module path -> public names the reference defines at the same path
REFERENCE_SURFACE = {
    "thermoextrap_tpu.adaptive_interp": [
        "window", "relative_fluctuations", "train_iterative",
        "train_recursive", "check_polynomial_consistency",
        "factory_state_idealgas", "callback_plot_progress",
        "plot_polynomial_consistency",
    ],
    "thermoextrap_tpu.beta": [
        "factory_derivatives", "factory_extrapmodel", "factory_perturbmodel",
    ],
    "thermoextrap_tpu.data": [
        "DataCallbackABC", "DataCallback", "AbstractData", "DataValuesBase",
        "DataValues", "DataValuesCentral", "factory_data_values",
        "DataCentralMomentsBase", "DataCentralMoments",
        "DataCentralMomentsVals",
    ],
    "thermoextrap_tpu.gpr_active.active_utils": [
        "get_logweights", "input_GP_from_state", "DataWrapper", "SimWrapper",
        "make_matern_expr", "make_rbf_expr", "make_poly_expr",
        "RBFDerivKernel", "ChangeInnerOuterRBFDerivKernel",
        "create_base_GP_model", "train_GPR", "create_GPR",
        "identityTransform", "UpdateStopABC", "UpdateFuncBase",
        "UpdateALMbrute", "UpdateRandom", "UpdateSpaceFill",
        "UpdateAdaptiveIntegrate", "UpdateALCbrute", "MetricBase", "MaxVar",
        "AvgVar", "MaxRelVar", "MaxRelGlobalVar", "AvgRelVar", "MSD",
        "MaxAbsRelDeviation", "MaxAbsRelGlobalDeviation",
        "AvgAbsRelDeviation", "ErrorStability", "MaxIter", "StopCriteria",
        "active_learning",
    ],
    "thermoextrap_tpu.gpr_active.gp_models": [
        "DerivativeKernel", "HetGaussianNoiseGP", "FullyHeteroscedasticGPR",
        "HetGaussianSimple", "multioutput_multivariate_normal",
        "HetGaussianDeriv", "HeteroscedasticGPR_analytical_scale",
        "HeteroscedasticGPR", "ConstantMeanWithDerivs", "LinearWithDerivs",
        "SympyMeanFunc",
    ],
    "thermoextrap_tpu.gpr_active.ig_active": [
        "extrap_IG", "multiOutput_extrap_IG", "IG_DataWrapper", "SimulateIG",
    ],
    "thermoextrap_tpu.gpr_active.sine_active": ["noise_func", "make_data"],
    "thermoextrap_tpu.idealgas": [
        "x_ave", "x_var", "x_prob", "u_prob", "x_cdf", "x_sample", "u_sample",
        "dbeta_xave", "dbeta_xave_minuslog", "dbeta_xave_depend",
        "dbeta_xave_depend_minuslog", "dvol_xave", "x_beta_extrap",
        "x_beta_extrap_minuslog", "x_beta_extrap_depend",
        "x_beta_extrap_depend_minuslog", "x_vol_extrap", "generate_data",
    ],
    "thermoextrap_tpu.lnpi": [
        "factory_derivatives", "lnPiDataCallback", "factory_extrapmodel_lnPi",
    ],
    # reference models.py split into models/extrap.py + models/derivatives.py
    "thermoextrap_tpu.models.extrap": [
        "ExtrapModel", "StateCollection", "xr_weights_minkowski",
        "ExtrapWeightedModel", "InterpModel", "InterpModelPiecewise",
        "PerturbModel", "MBARModel",
    ],
    "thermoextrap_tpu.models.derivatives": ["Derivatives"],
    "thermoextrap_tpu.recursive_interp": ["RecursiveInterp"],
    "thermoextrap_tpu.stack": [
        "to_mean_var", "states_derivs_concat", "StackedDerivatives", "GPRData",
    ],
    "thermoextrap_tpu.volume": [
        "VolumeDerivFuncs", "factory_derivatives", "VolumeDataCallback",
        "factory_extrapmodel",
    ],
    "thermoextrap_tpu.volume_idealgas": [
        "VolumeDerivFuncsIG", "factory_derivatives", "factory_extrapmodel",
        "factory_extrapmodel_data",
    ],
}

# reference name -> (reference module, replacement here).  Every entry is a
# deliberate design decision (SURVEY.md §7 / PARITY.md), not a gap.
DROPPED = {
    # runtime-sympy machinery -> build-time truncated-series engine
    "SymFuncBase": ("models.py", "ops/series.py jet algebra"),
    "SymDerivBase": ("models.py", "models/derivatives.py closed recursions"),
    "SymSubs": ("models.py", "n/a (no runtime sympy)"),
    "Lambdify": ("models.py", "n/a (no runtime sympy)"),
    "SymMinusLog": ("models.py", "series.series_neg_log"),
    "factory_minus_log": ("models.py", "post_func='minus_log'"),
    "taylor_series_norm": ("models.py", "series.coefs_from_derivs"),
    "PiecewiseMixin": ("models.py", "folded into InterpModelPiecewise"),
    "SymDerivBeta": ("beta.py", "beta.factory_derivatives"),
    "du_func": ("beta.py", "closed-form engine"),
    "u_func_central": ("beta.py", "closed-form engine"),
    "u_func": ("beta.py", "closed-form engine"),
    "xu_func": ("beta.py", "closed-form engine"),
    "dxdu_func_nobeta": ("beta.py", "closed-form engine"),
    "dxdu_func_beta": ("beta.py", "closed-form engine"),
    "x_func_central_nobeta": ("beta.py", "closed-form engine"),
    "x_func_central_beta": ("beta.py", "closed-form engine"),
    "lnPi_func_central": ("lnpi.py", "models.derivatives.lnpi_coefs"),
    "lnPi_func_raw": ("lnpi.py", "models.derivatives.lnpi_coefs"),
    # xarray plumbing -> positional layout convention
    "DataSelector": ("data.py", "plain moment arrays"),
    "build_aves_xu": ("data.py", "ops.moments.reduce_raw_comoments"),
    "build_aves_dxdu": ("data.py", "ops.moments.reduce_central_comoments"),
    "stack_dataarray": ("stack.py", "stack.stack_multidim"),
    "wrap_like_dataarray": ("stack.py", "plain arrays"),
    "multiindex_to_array": ("stack.py", "stack_multidim returns coords"),
    "apply_reduction": ("stack.py", "numpy reductions"),
    # deprecated duplicate kept only for the reference's own back-compat
    "make_rbf_expr_old": ("active_utils.py", "make_rbf_expr"),
}


@pytest.mark.parametrize("module", sorted(REFERENCE_SURFACE))
def test_reference_names_resolve(module):
    mod = importlib.import_module(module)
    missing = [n for n in REFERENCE_SURFACE[module] if not hasattr(mod, n)]
    assert not missing, f"{module} lacks reference names: {missing}"


def test_dropped_names_stay_dropped():
    # if one of these ever appears, promote it to REFERENCE_SURFACE
    for name, (ref_mod, _repl) in DROPPED.items():
        home = {
            "models.py": "thermoextrap_tpu.models.extrap",
            "beta.py": "thermoextrap_tpu.beta",
            "lnpi.py": "thermoextrap_tpu.lnpi",
            "data.py": "thermoextrap_tpu.data",
            "stack.py": "thermoextrap_tpu.stack",
            "active_utils.py": "thermoextrap_tpu.gpr_active.active_utils",
        }[ref_mod]
        assert not hasattr(importlib.import_module(home), name)


def test_virtual_base_classes_support_isinstance():
    from thermoextrap_tpu import data as d

    vals = d.factory_data_values(
        uv=np.arange(4.0), xv=np.arange(4.0), order=2, central=True
    )
    moms = d.DataCentralMoments.zeros(2)
    dvals = d.DataCentralMomentsVals.from_vals(np.arange(4.0), np.arange(4.0), 2)
    assert isinstance(vals, d.AbstractData)
    assert isinstance(moms, d.AbstractData)
    assert isinstance(dvals, d.AbstractData)
    assert isinstance(vals, d.DataValuesBase)
    assert not isinstance(moms, d.DataValuesBase)
    assert isinstance(moms, d.DataCentralMomentsBase)
    assert isinstance(dvals, d.DataCentralMomentsBase)


def test_experimental_reexports_are_lazy_but_real():
    import thermoextrap_tpu.gpr_active.experimental as exp
    import thermoextrap_tpu.gpr_active.gp_models as g

    assert g.HetGaussianNoiseGP is exp.HetGaussianNoiseGP
    assert g.FullyHeteroscedasticGPR is exp.FullyHeteroscedasticGPR
    assert g.HeteroscedasticGPR_analytical_scale is g.HeteroscedasticGPRAnalyticalScale
    with pytest.raises(AttributeError):
        g.not_a_reference_name  # noqa: B018
