"""YOLOv8 decode: DFL integral -> tblr -> xyxy * stride, sigmoid cls
(trainer/eval_yolov8.py:75-102). No objectness branch — the shared
postprocess contract gets obj=1 so conf = cls prob."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..losses.yolov8 import dfl_decode, v8_make_grid
from ..ops.boxes import tblr2xyxy

__all__ = ["decode_yolov8"]


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
