"""Device mesh + sharding helpers — the distributed layer.

Replaces the reference's entire L1 runtime (utils/launch.py process spawner,
utils/dist.py NCCL/gloo collectives, utils/allreduce_norm.py BN sync,
utils/setup_env.py NCCL env plumbing) with single-controller JAX:

* one process per host, `jax.distributed.initialize()` for multi-host,
* a 1-D ('data',) Mesh over all devices — the reference's parallelism story
  is DP-only (DDP, SURVEY §2.1), so the batch axis is the only sharded axis;
  the helpers are written against an arbitrary mesh so tensor axes can be
  added later without touching call sites,
* gradient all-reduce is compiler-inserted by jit from sharding annotations
  (no DDP hooks),
* per-replica BN stats live in train/ddp.py (`sync_replica_stats` is the
  pre-eval all_reduce_norm equivalent, utils/allreduce_norm.py:91-98);
  the default pjit path computes BN over the global batch so needs no sync.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate_state",
    "maybe_initialize_distributed",
    "process_count",
    "process_index",
]


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch dict on device, batch-dim sharded.

    Per-host batches must already be the per-host slice under multi-host
    (the loader's rank/world_size handles the index sharding).
    """
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate_state(state: Any, mesh: Mesh):
    """Replicate a pytree (e.g. TrainState) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def maybe_initialize_distributed(log_fn=None) -> bool:
    """Multi-host wiring: call `jax.distributed.initialize()` when launched
    under a multi-host coordinator (the reference contract is
    utils/launch.py:39-84's num_machines/machine_rank plumbing).

    Env-gated and idempotent: runs only when the standard coordination
    variables are present (JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES +
    JAX_PROCESS_ID — jax.distributed reads them natively — or a TPU-pod
    runtime where initialize() autodetects). Single-process runs skip it,
    exactly like the reference's world_size==1 no-op seams
    (utils/dist.py:67-78). Returns True if initialize() was invoked.
    """
    import os

    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return False
    manual = all(
        os.environ.get(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")
    )
    auto = os.environ.get("YOLOSERIES_TPU_DISTRIBUTED") == "1"
    if not (manual or auto):
        return False
    if manual:
        # pass explicitly — not every jax version reads NUM_PROCESSES /
        # PROCESS_ID from the environment
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )
    else:  # TPU-pod runtime: initialize() autodetects everything
        jax.distributed.initialize()
    if log_fn is not None:
        log_fn(
            f"jax.distributed initialized: process {jax.process_index()}"
            f"/{jax.process_count()}, {jax.local_device_count()} local devices"
        )
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()
