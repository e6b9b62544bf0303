"""YOLOX decode: anchor-free, xy=(p+grid)*stride, wh=exp(p)*stride
(trainer/eval_yolox.py decode; same formulas as loss/yolox_loss.py:111-114).
Feeds the shared `postprocess_detections` / `Evaluator` pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["decode_yolox", "decode_topk_yolox"]


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


def decode_topk_yolox(stage_preds, num_class: int, k: int, conf_threshold,
                      cls_threshold, strides=(8, 16, 32), num_anchor: int = 1,
                      dtype=jnp.float32):
    """Fused candidate selection + sparse decode (serving path).

    Same structure as :func:`yoloseries_tpu.evaluation.decode_topk_yolov5`:
    score `sigmoid(obj) * sigmoid(max cls)` straight off the raw maps, one
    global top-k over the stage-concatenated score planes (index order
    identical to :func:`decode_yolox`), then sparse gathers of the K winning
    rows. Returns (boxes_xyxy (B,K,4), scores (B,K), cls_ids (B,K))."""
    from .select import topk_gather

    no = 5 + num_class
    stage_scores, stage_rows, consts = [], [], []
    for pred, stride in zip(stage_preds, strides):
        b, h, w, c = pred.shape
        ns = h * w * num_anchor
        p = pred.astype(dtype).reshape(b, ns, no)
        obj = jax.nn.sigmoid(p[..., 4])
        cls_logit = p[..., 5:]
        cls_conf = obj * jax.nn.sigmoid(jnp.max(cls_logit, axis=-1))
        valid = (obj >= conf_threshold) & (cls_conf > cls_threshold)
        stage_scores.append(jnp.where(valid, cls_conf, 0.0).astype(jnp.float32))
        stage_rows.append(p)

        ii = np.arange(ns)
        cell = ii // num_anchor
        consts.append(np.stack(
            [
                (cell % w).astype(np.float32),
                (cell // w).astype(np.float32),
                np.full(ns, float(stride), np.float32),
            ],
            axis=1,
        ))

    score_f, idx_f, (rows,) = topk_gather(stage_scores, k, [stage_rows])

    const_all = jnp.asarray(np.concatenate(consts, axis=0), jnp.float32)
    ck = jnp.take(const_all, idx_f, axis=0)  # (B, K, 3)

    cls_f = jnp.argmax(rows[..., 5:], axis=-1)
    stride_f = ck[..., 2:3]
    xy = (rows[..., 0:2] + ck[..., 0:2]) * stride_f
    half = jnp.exp(jnp.clip(rows[..., 2:4], -20.0, 20.0)) * stride_f * 0.5
    boxes = jnp.concatenate([xy - half, xy + half], axis=-1).astype(jnp.float32)
    return boxes, score_f, cls_f.astype(jnp.float32)
