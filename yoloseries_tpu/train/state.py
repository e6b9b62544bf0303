"""TrainState pytree + the jitted train step factory.

The reference spreads this across the 860-line Training god-class
(train_yolov5.py:49-806); here the mutable run state is ONE pytree —
params, BN stats, optimizer state, EMA shadow, loss-balance state, step —
so it jits, shards, donates, and checkpoints as a unit.

Gradient accumulation is a `lax.scan` over k microbatches inside one jitted
step (TPU-idiomatic: no Python-side no_sync dance, one optimizer update +
one EMA update per call, matching the reference's update-on-boundary
behavior, train_yolov5.py:342-350).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses.yolov5 import YOLOv5LossConfig, initial_balances, yolov5_loss
from .ema import ema_update

__all__ = ["TrainState", "create_train_state", "make_train_step"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray  # optimizer updates applied
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any
    ema_count: jnp.ndarray
    balances: jnp.ndarray  # per-stage conf-loss balance state
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def create_train_state(model, tx, rng, input_shape, num_stages: int = 3,
                       balances=None) -> TrainState:
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if balances is None:
        balances = initial_balances(num_stages)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
        ema_batch_stats=jax.tree.map(jnp.copy, batch_stats),
        ema_count=jnp.zeros((), jnp.float32),
        balances=jnp.asarray(balances),
        apply_fn=model.apply,
        tx=tx,
    )


def make_train_step(
    loss,
    anchors=None,
    accumulate: int = 1,
    do_ema: bool = True,
    compute_dtype=jnp.float32,
    donate: bool = True,
    resize_to=None,
    base_hw=None,
):
    """Build the jitted train step.

    ``loss`` is either a family loss closure
    ``loss_fn(preds, targets, balances) -> (loss_dict, new_balances)``
    or (back-compat) a YOLOv5LossConfig paired with ``anchors``.

    The returned fn takes (state, batch) where batch = {'img': uint8
    (k*B, H, W, 3), 'ann': f32 (k*B, M, 6)} with k = ``accumulate``
    microbatches stacked along the batch axis, and returns
    (new_state, metrics).

    Activation rematerialization is a MODEL knob, not a step knob (a
    single outer jax.checkpoint region saves nothing: its backward
    re-materializes the whole forward anyway). Pass ``remat=True`` to
    the model constructor (models/yolov5.py CSPTrunk) to checkpoint per
    CSP stage instead.

    ``resize_to``/``base_hw``: multi-scale training with the REFERENCE's
    numerics (train_yolov5.py:526-544): the collated base-size batch is
    bilinearly interpolated ON DEVICE to ``resize_to`` and the box targets
    scaled by max(resize_to)/max(base_hw) — instead of re-letterboxing
    later batches at the new size. One compiled step per /32 bucket; the
    ``loss`` closure must be built at ``resize_to``. Bilinearity makes
    resize-then-/255 equal the reference's /255-then-resize.
    """
    if isinstance(loss, YOLOv5LossConfig):
        cfg = loss
        anchors_arr = jnp.asarray(anchors)

        def family_loss(preds, targets, balances):
            return yolov5_loss(preds, targets, anchors_arr, balances, cfg)
    else:
        family_loss = loss

    def loss_fn(params, batch_stats, balances, img_u8, ann, apply_fn):
        img = img_u8.astype(compute_dtype) / jnp.asarray(255.0, compute_dtype)
        preds, mutated = apply_fn(
            {"params": params, "batch_stats": batch_stats},
            img,
            train=True,
            mutable=["batch_stats"],
        )
        loss_dict, new_balances = family_loss(preds, ann, balances)
        aux = (mutated["batch_stats"], new_balances, loss_dict)
        return loss_dict["tot_loss"], aux

    if resize_to is not None:
        assert base_hw is not None, "resize_to needs base_hw for the scale"
        ms_scale = float(max(resize_to)) / float(max(base_hw))

    def train_step(state: TrainState, batch):
        k = accumulate
        img = batch["img"]
        ann = batch["ann"]
        if resize_to is not None and tuple(img.shape[1:3]) != tuple(resize_to):
            # reference mutil_scale_training: F.interpolate(bilinear,
            # align_corners=False) on the collated batch + targets[:4] *=
            # scale (train_yolov5.py:536-543). jax.image.resize 'bilinear'
            # uses the same half-pixel sampling; antialias off to match
            # torch's non-antialiased downscale.
            img = jax.image.resize(
                img.astype(compute_dtype),
                (img.shape[0], resize_to[0], resize_to[1], img.shape[3]),
                method="bilinear", antialias=False,
            )
            ann = jnp.concatenate([ann[..., :4] * ms_scale, ann[..., 4:]], -1)
        micro_b = img.shape[0] // k
        img = img.reshape(k, micro_b, *img.shape[1:])
        ann = ann.reshape(k, micro_b, *ann.shape[1:])

        grad_fn = jax.grad(loss_fn, has_aux=True)

        def scan_body(carry, xs):
            grads_acc, batch_stats, balances = carry
            mb_img, mb_ann = xs
            grads, (batch_stats, balances, loss_dict) = grad_fn(
                state.params, batch_stats, balances, mb_img, mb_ann, state.apply_fn
            )
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, batch_stats, balances), loss_dict

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        (grads, new_batch_stats, new_balances), loss_hist = jax.lax.scan(
            scan_body, (zero_grads, state.batch_stats, state.balances), (img, ann)
        )
        if k > 1:
            grads = jax.tree.map(lambda g: g / k, grads)

        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)

        if do_ema:
            new_count = state.ema_count + 1.0
            new_ema_params = ema_update(state.ema_params, new_params, new_count)
            new_ema_stats = ema_update(
                state.ema_batch_stats, new_batch_stats, new_count
            )
        else:
            new_count = state.ema_count
            new_ema_params = state.ema_params
            new_ema_stats = state.ema_batch_stats

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            ema_params=new_ema_params,
            ema_batch_stats=new_ema_stats,
            ema_count=new_count,
            balances=new_balances,
        )
        metrics = jax.tree.map(jnp.mean, loss_hist)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
