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
* `sync_batch_stats` pmeans BN running stats across data shards before eval,
  matching all_reduce_norm's pre-eval sync (utils/allreduce_norm.py:91-98)
  rather than switching to sync-BN.
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
    "sync_batch_stats",
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


def sync_batch_stats(batch_stats: Any):
    """Cross-replica mean of BN running stats before evaluation.

    Under jit-based data parallelism with replicated params, each device
    holds identical state, so this is only needed when training with
    per-device BN via shard_map/pmap. With the default pjit path (params
    replicated, batch sharded) XLA computes BN batch statistics over the
    GLOBAL batch already; this function is then a no-op identity kept for
    API parity with all_reduce_norm (utils/allreduce_norm.py:91).
    """
    return batch_stats


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()
