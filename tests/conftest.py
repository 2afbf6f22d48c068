"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective tests use
XLA's host-platform device virtualization instead. These env vars must be set
before the first `import jax` anywhere in the test process.
"""
import os

# The image pins JAX_PLATFORMS=axon (single real TPU chip via tunnel); tests
# must run on the virtual CPU mesh, so override — don't setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Keep CPU test runs deterministic and quiet.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
