"""Test harness: run everything on a virtual 8-device CPU backend.

This is the 'fake backend' for data-parallel semantics called for by
SURVEY.md §4 — multi-device tests run on XLA host devices so the sharding
path is exercised without TPU hardware.
"""
import os

# must be set before jax is imported anywhere
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8 "
                      + os.environ.get("XLA_FLAGS", ""))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# the axon site hook pins jax_platforms=axon; override it for the test suite
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite's big GAN-step compiles (~2 min
# each on this 1-core host) hit the cache on re-runs. Safe fallback: cache
# errors degrade to a normal compile. Dir is gitignored.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
