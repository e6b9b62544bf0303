"""Test configuration: run everything on a simulated 8-device CPU mesh.

Must set the env vars before jax is imported anywhere in the test process.
Multi-device sharding tests rely on the 8 fake devices; numeric tests just
use CPU for speed and determinism.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(7)
