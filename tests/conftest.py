"""Test configuration: force JAX onto CPU with a virtual 8-device mesh.

The container's sitecustomize registers the TPU backend at interpreter start,
so env vars alone are latched too late — use ``jax.config.update`` before any
backend is initialized.  Tests always run on CPU (fast, no TPU contention);
multi-device sharding tests use the 8 virtual host devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(11997733)
