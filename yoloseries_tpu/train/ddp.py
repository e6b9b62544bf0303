"""DDP-semantics data-parallel train step: per-replica BatchNorm via shard_map.

The default pjit path computes BN batch statistics over the GLOBAL batch
(sync-BN behavior). The reference instead trains per-replica BN (DDP with
broadcast_buffers=False, train_yolov5.py:219-220) and averages the running
stats across ranks only before evaluation (utils/allreduce_norm.py:91-98).
This module replicates those training dynamics exactly:

* the train step runs under `shard_map` over the ('data',) mesh — each
  device computes its forward/BN statistics on its LOCAL shard,
* gradients are `lax.pmean`'d across the axis (DDP's allreduce-mean),
* BN running stats (and their EMA shadow) carry a leading device axis,
  sharded over the mesh — each replica's stats evolve independently,
* `sync_replica_stats` averages them (the pre-eval all_reduce_norm).

Params, optimizer state, EMA params and loss balances stay replicated
(identical on every device, like DDP's synchronized modules).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .ema import ema_update
from .state import TrainState

if hasattr(jax, "shard_map"):  # jax >= 0.5
    shard_map = jax.shard_map
else:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

__all__ = [
    "tile_batch_stats",
    "sync_replica_stats",
    "make_ddp_train_step",
    "shard_ddp_state",
]


def tile_batch_stats(batch_stats, n_devices: int):
    """Add a leading device axis to every BN-stat leaf (replicated start)."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_devices,) + x.shape), batch_stats
    )


def sync_replica_stats(batch_stats):
    """Mean over the leading device axis — all_reduce_norm's pre-eval sync
    (utils/allreduce_norm.py:56-98). Returns stats WITHOUT the device axis.

    Computed on host: the stats tree is tiny (~KBs), this runs once before
    an eval pass, and device-side reductions over shard_map-produced arrays
    trip an XLA:CPU check failure on the fake-device test mesh.
    """
    import numpy as np

    return jax.tree.map(
        lambda x: jnp.asarray(np.mean(jax.device_get(x), axis=0)), batch_stats
    )


def shard_ddp_state(state: TrainState, mesh) -> TrainState:
    """Place a TrainState for the DDP step: BN stats sharded over their
    leading device axis, everything else replicated."""
    n_dev = mesh.devices.size
    repl = NamedSharding(mesh, P())
    dev0 = NamedSharding(mesh, P("data"))

    def place_repl(x):
        return jax.device_put(x, repl)

    def place_stats(x):
        return jax.device_put(x, dev0)

    return state.replace(
        step=place_repl(state.step),
        params=jax.tree.map(place_repl, state.params),
        batch_stats=jax.tree.map(place_stats, tile_batch_stats(state.batch_stats, n_dev)),
        opt_state=jax.tree.map(place_repl, state.opt_state),
        ema_params=jax.tree.map(place_repl, state.ema_params),
        ema_batch_stats=jax.tree.map(
            place_stats, tile_batch_stats(state.ema_batch_stats, n_dev)
        ),
        ema_count=place_repl(state.ema_count),
        balances=place_repl(state.balances),
    )


def make_ddp_train_step(loss_fn, mesh, apply_fn, tx, accumulate: int = 1,
                        do_ema: bool = True, compute_dtype=jnp.float32,
                        resize_to=None, base_hw=None):
    """Build the per-replica-BN train step over a ('data',) mesh.

    The returned fn takes (state, batch) where state was prepared with
    `shard_ddp_state` and batch = {'img': uint8 (k*B, H, W, 3), 'ann':
    (k*B, M, 6)} sharded over the batch axis, with k = ``accumulate``
    microbatches stacked along it (the reference's no_sync accumulation,
    train_yolov5.py:327-346: local grads accumulate per microbatch, one
    allreduce + optimizer/EMA update per boundary). Returns
    (new_state, metrics); metrics are cross-replica means.
    """
    axis = "data"
    if resize_to is not None:
        assert base_hw is not None, "resize_to needs base_hw for the scale"
        ms_scale = float(max(resize_to)) / float(max(base_hw))

    def per_device(params, batch_stats, opt_state, ema_params, ema_stats,
                   ema_count, balances, step, img_u8, ann):
        if resize_to is not None and tuple(img_u8.shape[1:3]) != tuple(resize_to):
            # reference multi-scale numerics: bilinear batch interpolation
            # + target scaling (train_yolov5.py:536-543; see
            # state.make_train_step for the full rationale)
            img_u8 = jax.image.resize(
                img_u8.astype(compute_dtype),
                (img_u8.shape[0], resize_to[0], resize_to[1], img_u8.shape[3]),
                method="bilinear", antialias=False,
            )
            ann = jnp.concatenate([ann[..., :4] * ms_scale, ann[..., 4:]], -1)
        # batch_stats arrives with the sharded leading device axis -> (1, ...)
        local_stats = jax.tree.map(lambda x: x[0], batch_stats)
        local_ema_stats = jax.tree.map(lambda x: x[0], ema_stats)

        def fwd(p, stats, img, targets, bal):
            x = img.astype(compute_dtype) / jnp.asarray(255.0, compute_dtype)
            preds, mutated = apply_fn(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            loss_dict, new_bal = loss_fn(preds, targets, bal)
            return loss_dict["tot_loss"], (mutated["batch_stats"], new_bal, loss_dict)

        grad_fn = jax.grad(fwd, has_aux=True)
        k = accumulate
        micro_b = img_u8.shape[0] // k
        img_k = img_u8.reshape(k, micro_b, *img_u8.shape[1:])
        ann_k = ann.reshape(k, micro_b, *ann.shape[1:])

        def scan_body(carry, xs):
            grads_acc, stats, bal = carry
            mb_img, mb_ann = xs
            g, (stats, bal, loss_dict) = grad_fn(params, stats, mb_img, mb_ann, bal)
            return (jax.tree.map(jnp.add, grads_acc, g), stats, bal), loss_dict

        zero_grads = jax.tree.map(jnp.zeros_like, params)
        (grads, new_stats, new_balances), loss_hist = jax.lax.scan(
            scan_body, (zero_grads, local_stats, balances), (img_k, ann_k)
        )
        if k > 1:
            grads = jax.tree.map(lambda g: g / k, grads)
        loss_dict = jax.tree.map(jnp.mean, loss_hist)

        # DDP gradient allreduce-mean
        grads = jax.lax.pmean(grads, axis)
        loss_dict = jax.lax.pmean(loss_dict, axis)
        new_balances = jax.lax.pmean(new_balances, axis)

        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        if do_ema:
            new_count = ema_count + 1.0
            new_ema_params = ema_update(ema_params, new_params, new_count)
            new_ema_stats = ema_update(local_ema_stats, new_stats, new_count)
        else:
            new_count = ema_count
            new_ema_params = ema_params
            new_ema_stats = local_ema_stats

        metrics = dict(loss_dict)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            new_params,
            jax.tree.map(lambda x: x[None], new_stats),  # re-add device axis
            new_opt_state,
            new_ema_params,
            jax.tree.map(lambda x: x[None], new_ema_stats),
            new_count,
            new_balances,
            step + 1,
            metrics,
        )

    repl = P()
    dev = P(axis)
    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(repl, dev, repl, repl, dev, repl, repl, repl, dev, dev),
        out_specs=(repl, dev, repl, repl, dev, repl, repl, repl, repl),
        check_vma=False,
    )

    @jax.jit
    def train_step(state: TrainState, batch):
        (params, stats, opt_state, ema_params, ema_stats, ema_count,
         balances, step, metrics) = mapped(
            state.params, state.batch_stats, state.opt_state,
            state.ema_params, state.ema_batch_stats, state.ema_count,
            state.balances, state.step, batch["img"], batch["ann"],
        )
        new_state = state.replace(
            step=step, params=params, batch_stats=stats, opt_state=opt_state,
            ema_params=ema_params, ema_batch_stats=ema_stats,
            ema_count=ema_count, balances=balances,
        )
        return new_state, metrics

    return train_step
