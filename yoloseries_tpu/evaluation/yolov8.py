"""YOLOv8 decode: DFL integral -> tblr -> xyxy * stride, sigmoid cls
(trainer/eval_yolov8.py:75-102). No objectness branch — the shared
postprocess contract gets obj=1 so conf = cls prob."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..losses.yolov8 import dfl_decode, v8_make_grid
from ..ops.boxes import tblr2xyxy

__all__ = ["decode_yolov8", "decode_topk_yolov8"]


def decode_yolov8(stage_preds, num_class: int, input_size,
                  strides=(4, 8, 16, 32), reg: int = 16):
    """4 NHWC maps (B, H, W, 4*reg+nc) -> (B, N, 5+nc) [cx,cy,w,h,1,cls...] px."""
    if isinstance(stage_preds, dict):
        stage_preds = list(stage_preds.values())
    grids, strides_col = v8_make_grid(input_size, strides)
    flat = []
    for pred in stage_preds:
        b, h, w, c = pred.shape
        flat.append(pred.astype(jnp.float32).reshape(b, h * w, c))
    all_preds = jnp.concatenate(flat, axis=1)
    pred_dfl = all_preds[..., : 4 * reg]
    pred_cls = jax.nn.sigmoid(all_preds[..., 4 * reg :])

    tblr = dfl_decode(pred_dfl, reg)
    xyxy = tblr2xyxy(tblr, grids) * strides_col[None]
    xy = (xyxy[..., 0:2] + xyxy[..., 2:4]) * 0.5
    wh = xyxy[..., 2:4] - xyxy[..., 0:2]
    obj = jnp.ones_like(xy[..., 0:1])
    return jnp.concatenate([xy, wh, obj, pred_cls], axis=-1)


def decode_topk_yolov8(stage_preds, num_class: int, input_size, k: int,
                       conf_threshold, cls_threshold,
                       strides=(4, 8, 16, 32), reg: int = 16,
                       dtype=jnp.float32):
    """Fused candidate selection + sparse DFL decode (serving path).

    Score `sigmoid(max cls logit)` (v8 has no objectness; the dense path's
    obj=1 makes conf = cls prob) computed on the raw maps, ONE global top-k
    over the stage-concatenated score planes (index order identical to
    :func:`decode_yolov8`), then the DFL softmax-expectation runs on just
    the K winning rows instead of all N.
    Returns (boxes_xyxy (B,K,4), scores (B,K), cls_ids (B,K))."""
    if isinstance(stage_preds, dict):
        stage_preds = list(stage_preds.values())
    grids, strides_col = v8_make_grid(input_size, strides)

    from .select import topk_gather

    stage_scores, stage_rows = [], []
    for pred in stage_preds:
        b, h, w, c = pred.shape
        p = pred.astype(dtype).reshape(b, h * w, c)
        cls_logit = p[..., 4 * reg:]
        cls_conf = jax.nn.sigmoid(jnp.max(cls_logit, axis=-1))
        # dense-path gate: obj = 1, so conf_threshold only gates if > 1
        valid = (1.0 >= conf_threshold) & (cls_conf > cls_threshold)
        stage_scores.append(jnp.where(valid, cls_conf, 0.0).astype(jnp.float32))
        stage_rows.append(p)

    score_f, idx_f, (rows,) = topk_gather(stage_scores, k, [stage_rows])

    gk = jnp.take(grids, idx_f, axis=0)        # (B, K, 2)
    sk = jnp.take(strides_col, idx_f, axis=0)  # (B, K, 1)

    cls_f = jnp.argmax(rows[..., 4 * reg:], axis=-1)
    tblr = dfl_decode(rows[..., : 4 * reg].astype(jnp.float32), reg)  # (B, K, 4)
    boxes = tblr2xyxy(tblr, gk) * sk
    return boxes.astype(jnp.float32), score_f, cls_f.astype(jnp.float32)
