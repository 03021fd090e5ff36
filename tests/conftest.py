"""Test harness: force CPU with a virtual 8-device mesh for sharding tests.

The unit/property suite must be hermetic and fast; TPU hardware (if any) is
exercised by bench.py, not the tests.  The axon sitecustomize initializes a
remote TPU backend at interpreter start, so env vars alone are not enough —
we override via jax.config before any test imports build arrays.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from bio_diffusion_tpu.utils.compilation_cache import enable_compilation_cache

# repeated suite runs on the 1-core host reuse compiled executables
enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
