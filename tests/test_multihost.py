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


_CHILD_VAL = r"""
import os, sys
import numpy as np

from yoloseries_tpu.parallel import maybe_initialize_distributed

assert maybe_initialize_distributed() is True
import jax
from yoloseries_tpu.ops.metrics import DetectionMetrics

pid = jax.process_index()
rng = np.random.default_rng(99)  # SAME stream on both hosts
images = []
for i in range(12):
    n_gt, n_pred = rng.integers(1, 6), rng.integers(1, 9)
    xy = rng.uniform(0, 200, (n_gt, 2))
    gt = np.concatenate([xy, xy + rng.uniform(10, 60, (n_gt, 2)),
                         rng.integers(0, 3, (n_gt, 1))], 1)
    # predictions: jittered copies of gt rows + noise rows
    rows = []
    for g in gt:
        if rng.uniform() < 0.8:
            rows.append([g[0]+rng.normal(0,2), g[1]+rng.normal(0,2),
                         g[2]+rng.normal(0,2), g[3]+rng.normal(0,2),
                         rng.uniform(0.3, 1.0), g[4]])
    for _ in range(int(n_pred) - len(rows)):
        xy2 = rng.uniform(0, 200, 2)
        rows.append([xy2[0], xy2[1], xy2[0]+30, xy2[1]+30,
                     rng.uniform(0.01, 1.0), rng.integers(0, 3)])
    images.append((gt, np.asarray(rows, np.float64)))

# single-process truth: every image through one accumulator
single = DetectionMetrics()
for g, p in images:
    single.add_image(g, p)
truth = single.compute()

# sharded: each host accumulates a disjoint half, then gathers
mine = DetectionMetrics()
for g, p in images[pid::2]:
    mine.add_image(g, p)
out = mine.gather_across_processes().compute()

for k in ("map", "map50", "mp", "mr"):
    assert abs(out[k] - truth[k]) < 1e-12, (k, out[k], truth[k])
np.testing.assert_allclose(out["ap"], truth["ap"], atol=1e-12)
print(f"child {pid} val ok")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_children(child_src, ok_marker):
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
                [sys.executable, "-c", child_src],
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
        assert f"child {pid} {ok_marker}" in out


def test_two_process_jax_distributed_smoke():
    _run_two_children(_CHILD, "ok")


def test_two_process_sharded_validation_map():
    """Rank-sharded validation (VERDICT r3 missing #4): each process scores
    half the images; DetectionMetrics.gather_across_processes must make the
    sharded mAP identical to the single-process full-set mAP."""
    _run_two_children(_CHILD_VAL, "val ok")
