"""Test harness: force an 8-device virtual CPU mesh before jax import.

Multi-device collectives are exercised without TPU hardware via
xla_force_host_platform_device_count, per the build contract (SURVEY.md §4).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env may pin a TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# a pytest plugin may import jax before this conftest runs, in which case
# the env var above is too late — force the platform through the config
# (works any time before backend initialization)
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on CPU; caching
# XLA executables across processes makes re-runs fast.
_CACHE_DIR = os.environ.get("TCAM_TPU_JAX_CACHE", "/tmp/jax_cache_tcam")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
