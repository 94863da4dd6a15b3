"""Test configuration: run everything on a virtual 8-device CPU mesh.

Kernels run in Pallas interpret mode on CPU (BASELINE.json config 1); sharding
tests use the 8 virtual devices (SURVEY.md §4).
"""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (real-TPU tunnel) and
# a sitecustomize registers the axon PJRT plugin AND pins jax.config's
# jax_platforms, so both the env var and the config must be overridden before
# any backend initializes.  (Real-TPU runs use benchmarks/, not the suite.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
