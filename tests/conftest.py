"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

This is the standard JAX pattern for testing pjit/sharding/collectives without
TPU hardware (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment's sitecustomize pins JAX_PLATFORMS to the remote TPU plugin;
# the config-level override wins regardless of import order.
jax.config.update("jax_platforms", "cpu")

import tempfile  # noqa: E402

# Hermetic persistent-compilation-cache location: the engine enables the
# cache by default (utils/compile_cache.py), and tests must not write into
# the user's real ~/.cache.  Pointing JAX at a per-session tmpdir here also
# exercises the cache path on every engine test.
jax.config.update(
    "jax_compilation_cache_dir",
    tempfile.mkdtemp(prefix="ssd_tpu_test_xla_cache_"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(23)  # reference's fixed seed (env.py:38-42)
