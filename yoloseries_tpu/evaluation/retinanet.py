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

__all__ = ["decode_retinanet"]


def decode_retinanet(regression, classification, anchors,
                     delta_scales=(0.1, 0.1, 0.2, 0.2)):
    """regression (B, A, 4|5), classification (B, A, nc) logits,
    anchors (A, 4) xyxy -> (B, A, 5+nc)."""
    anchors = anchors.astype(jnp.float32)
    a_xywh = xyxy2xywh(anchors)[None]  # (1, A, 4)
    reg = regression.astype(jnp.float32)
    d = reg[..., 0:4] * jnp.asarray(delta_scales)
    cx = d[..., 0] * a_xywh[..., 2] + a_xywh[..., 0]
    cy = d[..., 1] * a_xywh[..., 3] + a_xywh[..., 1]
    w = jnp.exp(jnp.clip(d[..., 2], -20.0, 20.0)) * a_xywh[..., 2]
    h = jnp.exp(jnp.clip(d[..., 3], -20.0, 20.0)) * a_xywh[..., 3]
    if reg.shape[-1] == 5:
        obj = jax.nn.sigmoid(reg[..., 4])
    else:
        obj = jnp.ones_like(cx)
    cls = jax.nn.sigmoid(classification.astype(jnp.float32))
    return jnp.concatenate(
        [jnp.stack([cx, cy, w, h, obj], axis=-1), cls], axis=-1
    )
