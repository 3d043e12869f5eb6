"""Test env: force CPU with 8 virtual devices BEFORE jax initializes, so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4: the reference has no distributed tests; we simulate a mesh)."""

import os

# NOTE: this environment exports JAX_PLATFORMS=axon (tunneled TPU) and the
# plugin overrides the env var — jax.config is the only reliable switch.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# CPU persistent-cache entries are host-specific AOT executables; disable
# (see paddlescience_tpu/__init__.py)
jax.config.update("jax_compilation_cache_dir", None)

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(42)
    yield
