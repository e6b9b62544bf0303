"""RetinaNet decode: anchor delta transform (trainer/eval_retinanet.py:22-58).

pred deltas (dx, dy, dw, dh) * scale_factors applied to anchor xywh ->
boxes; classification logits sigmoid into per-class scores. Output matches
the shared postprocess contract [cx, cy, w, h, obj, cls...]; obj is 1 for
the base model (score = cls prob) or sigmoid(cof) for the experiment
variant's 5th regression channel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.boxes import xyxy2xywh

__all__ = ["decode_retinanet", "decode_topk_retinanet"]


def _round_clip_xyxy(boxes, clip_size):
    """Round then clamp to the image (trainer/eval_retinanet.py:185-200:
    the reference `bbox_clip` rounds boxes to integers before clamping)."""
    h, w = clip_size
    boxes = jnp.round(boxes)
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0.0, w),
            jnp.clip(boxes[..., 1], 0.0, h),
            jnp.clip(boxes[..., 2], 0.0, w),
            jnp.clip(boxes[..., 3], 0.0, h),
        ],
        axis=-1,
    )


def decode_retinanet(regression, classification, anchors,
                     delta_scales=(0.1, 0.1, 0.2, 0.2), clip_size=None):
    """regression (B, A, 4|5), classification (B, A, nc) logits,
    anchors (A, 4) xyxy -> (B, A, 5+nc).

    ``clip_size`` (h, w): round + clamp decoded boxes to the image like the
    reference decode does (trainer/eval_retinanet.py:74, bbox_clip)."""
    anchors = anchors.astype(jnp.float32)
    a_xywh = xyxy2xywh(anchors)[None]  # (1, A, 4)
    reg = regression.astype(jnp.float32)
    d = reg[..., 0:4] * jnp.asarray(delta_scales)
    cx = d[..., 0] * a_xywh[..., 2] + a_xywh[..., 0]
    cy = d[..., 1] * a_xywh[..., 3] + a_xywh[..., 1]
    w = jnp.exp(jnp.clip(d[..., 2], -20.0, 20.0)) * a_xywh[..., 2]
    h = jnp.exp(jnp.clip(d[..., 3], -20.0, 20.0)) * a_xywh[..., 3]
    if clip_size is not None:
        half_w, half_h = w * 0.5, h * 0.5
        xyxy = jnp.stack(
            [cx - half_w, cy - half_h, cx + half_w, cy + half_h], axis=-1
        )
        xyxy = _round_clip_xyxy(xyxy, clip_size)
        cx = (xyxy[..., 0] + xyxy[..., 2]) * 0.5
        cy = (xyxy[..., 1] + xyxy[..., 3]) * 0.5
        w = xyxy[..., 2] - xyxy[..., 0]
        h = xyxy[..., 3] - xyxy[..., 1]
    if reg.shape[-1] == 5:
        obj = jax.nn.sigmoid(reg[..., 4])
    else:
        obj = jnp.ones_like(cx)
    cls = jax.nn.sigmoid(classification.astype(jnp.float32))
    return jnp.concatenate(
        [jnp.stack([cx, cy, w, h, obj], axis=-1), cls], axis=-1
    )


def decode_topk_retinanet(regression, classification, anchors, k: int,
                          conf_threshold, cls_threshold,
                          delta_scales=(0.1, 0.1, 0.2, 0.2), clip_size=None):
    """Fused candidate selection + sparse delta decode (serving path).

    Score `obj * sigmoid(max cls logit)` on the raw (B, A, nc) logits, one
    top-k (same index order as :func:`decode_retinanet`), then the anchor
    delta transform on only the K winning rows — the dense path materializes
    all ~77k anchors per image. Returns (boxes_xyxy, scores, cls_ids)."""
    reg = regression.astype(jnp.float32)
    if reg.shape[-1] == 5:
        obj = jax.nn.sigmoid(reg[..., 4])
    else:
        obj = jnp.ones_like(reg[..., 0])
    cls_logit = classification.astype(jnp.float32)
    cls_conf = obj * jax.nn.sigmoid(jnp.max(cls_logit, axis=-1))
    valid = (obj >= conf_threshold) & (cls_conf > cls_threshold)
    scores = jnp.where(valid, cls_conf, 0.0)

    kf = min(k, scores.shape[-1])
    score_f, idx_f = jax.lax.top_k(scores, kf)

    reg_k = jnp.take_along_axis(reg[..., 0:4], idx_f[..., None], axis=1)
    cls_k = jnp.take_along_axis(cls_logit, idx_f[..., None], axis=1)
    cls_f = jnp.argmax(cls_k, axis=-1)

    a_xywh = xyxy2xywh(anchors.astype(jnp.float32))  # (A, 4)
    ak = jnp.take(a_xywh, idx_f, axis=0)  # (B, K, 4)
    d = reg_k * jnp.asarray(delta_scales)
    cx = d[..., 0] * ak[..., 2] + ak[..., 0]
    cy = d[..., 1] * ak[..., 3] + ak[..., 1]
    hw = jnp.exp(jnp.clip(d[..., 2], -20.0, 20.0)) * ak[..., 2] * 0.5
    hh = jnp.exp(jnp.clip(d[..., 3], -20.0, 20.0)) * ak[..., 3] * 0.5
    boxes = jnp.stack([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)
    if clip_size is not None:
        boxes = _round_clip_xyxy(boxes, clip_size)
    return boxes, score_f, cls_f.astype(jnp.float32)
