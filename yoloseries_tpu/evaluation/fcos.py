"""FCOS decode (trainer/eval_fcos.py): boxes = grid center -/+ ltrb*stride,
score = centerness-weighted class probability. Shared postprocess contract:
[cx, cy, w, h, obj=sigmoid(ctr), cls...]."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["decode_fcos"]


def decode_fcos(cls_fms, reg_fms, ctr_fms, input_size):
    outs = []
    for cls_l, reg_l, ctr_l in zip(cls_fms, reg_fms, ctr_fms):
        b, h, w, nc = cls_l.shape
        stride = input_size[0] / h
        ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        grid = (
            jnp.stack([xs, ys], -1).reshape(-1, 2).astype(jnp.float32) * stride
            + stride // 2
        )  # (P, 2) pixel centers
        reg = reg_l.astype(jnp.float32).reshape(b, h * w, 4) * stride  # ltrb px
        x1 = grid[None, :, 0] - reg[..., 0]
        y1 = grid[None, :, 1] - reg[..., 1]
        x2 = grid[None, :, 0] + reg[..., 2]
        y2 = grid[None, :, 1] + reg[..., 3]
        cx = (x1 + x2) * 0.5
        cy = (y1 + y2) * 0.5
        ww = x2 - x1
        hh = y2 - y1
        obj = jax.nn.sigmoid(ctr_l.astype(jnp.float32).reshape(b, h * w))
        cls = jax.nn.sigmoid(cls_l.astype(jnp.float32).reshape(b, h * w, nc))
        outs.append(
            jnp.concatenate(
                [jnp.stack([cx, cy, ww, hh, obj], axis=-1), cls], axis=-1
            )
        )
    return jnp.concatenate(outs, axis=1)
