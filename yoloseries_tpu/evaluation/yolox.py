"""YOLOX decode: anchor-free, xy=(p+grid)*stride, wh=exp(p)*stride
(trainer/eval_yolox.py decode; same formulas as loss/yolox_loss.py:111-114).
Feeds the shared `postprocess_detections` / `Evaluator` pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["decode_yolox"]


def decode_yolox(stage_preds, num_class: int, strides=(8, 16, 32),
                 num_anchor: int = 1):
    """Per-stage NHWC maps -> (B, N, 5+nc) [cx, cy, w, h, obj, cls...] px,
    obj/cls sigmoided."""
    outs = []
    no = 5 + num_class
    for pred, stride in zip(stage_preds, strides):
        b, h, w, c = pred.shape
        p = pred.astype(jnp.float32).reshape(b, h, w, num_anchor, no)
        ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        grid = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)  # (h, w, 2)
        xy = (p[..., 0:2] + grid[None, :, :, None, :]) * stride
        wh = jnp.exp(jnp.clip(p[..., 2:4], -20.0, 20.0)) * stride
        rest = jax.nn.sigmoid(p[..., 4:])
        out = jnp.concatenate([xy, wh, rest], axis=-1)
        outs.append(out.reshape(b, h * w * num_anchor, no))
    return jnp.concatenate(outs, axis=1)
