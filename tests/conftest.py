"""Test configuration.

Tests run on CPU with 8 virtual devices (for sharding tests) and float64
enabled — the accuracy gates (1e-10 rtol vs analytic ideal gas, BASELINE.md)
require double precision, as does the reference (numpy/numba f64).
"""

import os

# The harness environment pre-sets JAX_PLATFORMS=axon (one real TPU chip) and
# a sitecustomize imports jax at interpreter startup, so env vars are too late
# here; steer via jax.config before the first computation instead.  Unit tests
# run on CPU with x64 for the 1e-10 accuracy gates, with 8 virtual devices for
# sharding tests.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# NOTE on child processes (multiprocessing spawn in SimWrapper tests,
# example-script subprocesses): they start FRESH interpreters, and the
# harness sitecustomize FORCES jax_platforms="axon,cpu" at startup — the
# JAX_PLATFORMS env var is overridden, so a child that computes with jax
# while the TPU chip is busy/wedged blocks on the chip claim.  Every child
# entry point must therefore steer itself with
# jax.config.update("jax_platforms", "cpu") in-process (see
# tests/test_active.py::_fake_sim and examples/_smoke.py); env vars cannot
# do it for them.

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--run-slow",
        action="store_true",
        default=False,
        help="run slow tests (reference tests/conftest.py:148-165 convention)",
    )


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: mark test as slow to run")
    config.addinivalue_line(
        "markers", "quick: <5-min cross-layer sanity tier (pytest -m quick)"
    )


# One representative slice of every layer, runnable in a single command
# budget: `python -m pytest -m quick` (~3 min on the contended 1-core host).
# Central registry (nodeid prefixes) rather than per-file decorators so the
# tier is visible and maintained in ONE place; a stale prefix fails loudly
# at COLLECTION time (pytest.UsageError raised in
# pytest_collection_modifyitems below when a full-suite collection matches
# nothing for some prefix).
QUICK_PREFIXES = (
    # L0 kernels + resampling (interpret-mode Pallas)
    "test_moments.py",
    # L0b series algebra vs sympy oracles
    "test_series.py",
    # symbolic identities + autodiff
    "test_identities.py",
    # L2 data layer cross-constructor matrix
    "test_data.py",
    # L3 ground-truth gate (exact discrete-Boltzmann oracle, fast subset)
    "test_derivatives.py::TestXAve::test_exact",
    "test_derivatives.py::TestLnPi::test_exact",
    # L4 models via the serving pipelines (bucket padding + perturb)
    "test_pipeline.py::TestBucketedRunner::test_padding_is_exact",
    "test_pipeline.py::TestPerturbPipeline::test_matches_perturb_model",
    # L6 GPR: closed-form Hermite RBF oracle + one heteroscedastic fit
    "test_gps.py::TestDerivativeKernel::test_k_vs_closed_form",
    "test_gps.py::TestHeteroscedasticGPR::test_trains",
    # native C++ engine parity
    "test_native.py",
    # streaming accumulation (exact pooling)
    "test_streaming.py::test_push_vals_matches_one_shot",
    "test_streaming.py::test_merge_matches_one_shot",
    "test_streaming.py::test_streaming_pipeline_matches_one_shot",
    # top-level API surface
    "test_import_parity.py",
    # docs performance-claim drift gate (cheap; keeps claims honest)
    "test_doc_claims.py",
)


def pytest_collection_modifyitems(config, items):
    matched = set()
    for item in items:
        nid = item.nodeid.split("tests/")[-1]
        for pref in QUICK_PREFIXES:
            if nid.startswith(pref):
                item.add_marker(pytest.mark.quick)
                matched.add(pref)
                break
    # a stale prefix (renamed test) must fail the tier, not silently shrink
    # it — but only when the whole suite is collected (a -k/-path subrun
    # legitimately sees few items)
    if len(items) > 400:
        stale = [p for p in QUICK_PREFIXES if p not in matched]
        if stale:
            msg = f"quick-tier prefixes match nothing (renamed?): {stale}"
            raise pytest.UsageError(msg)

    if config.getoption("--run-slow"):
        return
    skip_slow = pytest.mark.skip(reason="need --run-slow option to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture
def rng_np():
    return np.random.default_rng(42)
