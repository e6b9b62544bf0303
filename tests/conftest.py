"""Test configuration.

Reality check on this machine: the axon TPU plugin registers itself from
sitecustomize at interpreter startup and PINS the platform — setting
JAX_PLATFORMS=cpu afterwards (including here) has no effect. The test
suite therefore runs on the single real TPU chip through the relay.
Consequences handled here:

* TPU's default conv/matmul precision is bf16 — golden numeric tests need
  f32, so default matmul precision is forced to 'highest',
* anything needing MULTIPLE devices cannot run in-process (one chip);
  sharding tests spawn a subprocess with the plugin disabled and 8 fake
  CPU devices (`run_in_clean_subprocess`).
"""

import os

# honored only when the axon plugin is absent (e.g. clean subprocesses)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    """Every test not marked slow is fast: `pytest -m fast` is the quick
    subset (<5 min on the chip), `-m slow` the compile-heavy remainder."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


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
    # separate cache: entries written by the TPU-pinned parent process abort
    # with SIGILL/SIGABRT when loaded as CPU AOT results here
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache_cpu"
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
