"""Test harness: force JAX onto 8 virtual CPU devices (no TPU needed in CI).

The container's sitecustomize pre-registers a TPU backend and pins
JAX_PLATFORMS=axon, so plain env vars are not enough: override the platform
through jax.config *before any backend is initialized* (backends initialize
lazily, so doing it at conftest import time is safe).
"""

import os

_USE_TPU = os.environ.get("MATERIALIST_TPU_TESTS") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _USE_TPU and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
else:
    # TPU runs: persist compiled executables so the (minutes-long) cold
    # compiles of the fused march/shade kernels are paid once per image,
    # not once per pytest invocation. Cache lives next to the checkout
    # (ADVICE r3: do not hardcode /root/repo).
    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
# MATERIALIST_TPU_TESTS=1 keeps the real backend so `pytest -m tpu` can
# exercise the fused Pallas kernels on hardware.

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference fixtures not available")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
