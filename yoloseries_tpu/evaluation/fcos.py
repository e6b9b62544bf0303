"""FCOS decode (trainer/eval_fcos.py): boxes = grid center -/+ ltrb*stride,
score = centerness-weighted class probability. Shared postprocess contract:
[cx, cy, w, h, obj=sigmoid(ctr), cls...]."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["decode_fcos", "decode_topk_fcos"]


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


def decode_topk_fcos(cls_fms, reg_fms, ctr_fms, input_size, k: int,
                     conf_threshold, cls_threshold):
    """Fused candidate selection + sparse ltrb decode (serving path).

    Score `sigmoid(ctr) * sigmoid(max cls logit)` per level, one global
    top-k over the level-concatenated score planes (same index order as
    :func:`decode_fcos`), then the grid-center ltrb transform on only the
    K winning rows. Returns (boxes_xyxy, scores, cls_ids)."""
    import numpy as np

    from .select import topk_gather

    level_scores, level_cls, level_reg, consts = [], [], [], []
    for cls_l, reg_l, ctr_l in zip(cls_fms, reg_fms, ctr_fms):
        b, h, w, nc = cls_l.shape
        stride = input_size[0] / h
        ns = h * w
        cls_logit = cls_l.astype(jnp.float32).reshape(b, ns, nc)
        obj = jax.nn.sigmoid(ctr_l.astype(jnp.float32).reshape(b, ns))
        cls_conf = obj * jax.nn.sigmoid(jnp.max(cls_logit, axis=-1))
        valid = (obj >= conf_threshold) & (cls_conf > cls_threshold)
        level_scores.append(jnp.where(valid, cls_conf, 0.0))
        level_cls.append(cls_logit)
        level_reg.append(reg_l.astype(jnp.float32).reshape(b, ns, 4))

        ii = np.arange(ns)
        consts.append(np.stack(
            [
                (ii % w).astype(np.float32) * stride + stride // 2,
                (ii // w).astype(np.float32) * stride + stride // 2,
                np.full(ns, float(stride), np.float32),
            ],
            axis=1,
        ))

    score_f, idx_f, (cls_rows, reg_rows) = topk_gather(
        level_scores, k, [level_cls, level_reg]
    )

    const_all = jnp.asarray(np.concatenate(consts, axis=0), jnp.float32)
    ck = jnp.take(const_all, idx_f, axis=0)  # (B, K, 3)

    cls_f = jnp.argmax(cls_rows, axis=-1)
    ltrb = reg_rows * ck[..., 2:3]
    x1 = ck[..., 0] - ltrb[..., 0]
    y1 = ck[..., 1] - ltrb[..., 1]
    x2 = ck[..., 0] + ltrb[..., 2]
    y2 = ck[..., 1] + ltrb[..., 3]
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    return boxes, score_f, cls_f.astype(jnp.float32)
