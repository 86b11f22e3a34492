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


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-slow"):
        return
    skip_slow = pytest.mark.skip(reason="need --run-slow option to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture
def rng_np():
    return np.random.default_rng(42)
