"""Test configuration: CPU-only JAX for speed/determinism.

Multi-device (8 fake CPU devices) tests cannot run inside this process: the
machine's sitecustomize (axon TPU plugin) initializes the XLA runtime at
interpreter startup, locking the CPU device count before XLA_FLAGS can take
effect. Sharding tests therefore run their body in a subprocess with the
plugin disabled — see tests/test_sharding.py::run_in_clean_subprocess.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# persistent compilation cache: reruns skip the (slow) CPU XLA compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def run_in_clean_subprocess(code: str, n_devices: int = 8, timeout: int = 560):
    """Run a python snippet with the axon plugin disabled and N fake CPU
    devices. Returns the completed process; asserts exit code 0."""
    import subprocess
    import sys

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize skips axon registration
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    return proc
