"""Multi-host wiring smoke test (VERDICT round-1 item 8): two REAL processes
coordinate through jax.distributed on CPU, our env-gated
`maybe_initialize_distributed` performs the initialization, and a cross-host
collective + the loader's rank-sharded index stream both behave.

Reference contract being replaced: utils/launch.py:39-84 (process spawner +
TCP rendezvous) and utils/dist.py's world_size plumbing.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]

_CHILD = r"""
import os, sys
import numpy as np

from yoloseries_tpu.parallel import (
    make_mesh, maybe_initialize_distributed, process_count, process_index,
)

assert maybe_initialize_distributed() is True, "env gate failed to trigger"

import jax

assert jax.process_count() == 2, jax.process_count()
pid = jax.process_index()

# one cross-host collective: allgather each process's id
from jax.experimental import multihost_utils

got = multihost_utils.process_allgather(np.asarray([pid], np.int32))
assert sorted(got.ravel().tolist()) == [0, 1], got

# global mesh spans both processes' devices
mesh = make_mesh()
assert mesh.devices.size == jax.device_count() == 2

# loader rank sharding: the two hosts' index streams are disjoint and
# together cover the dataset (InfiniteSampler islice semantics)
from itertools import islice
from yoloseries_tpu.data.loader import infinite_indices

mine = list(islice(infinite_indices(10, seed=3, rank=pid, world_size=2), 5))
got = multihost_utils.process_allgather(np.asarray(mine, np.int32))
merged = sorted(got.ravel().tolist())
assert merged == list(range(10)), merged

print(f"child {pid} ok")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_jax_distributed_smoke():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon TPU relay plugin
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
        env.pop("XLA_FLAGS", None)
        env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _CHILD],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out}"
        assert f"child {pid} ok" in out
