"""Box-format conversions and box filters, pure jnp (jit/vmap/grad-safe).

Numerics follow the reference implementations in
yl-jiang/YOLOSeries utils/bbox_tools.py (xyxy2xywh:87, xyxy2xywhn:103,
xywh2xyxy:122, tblr2xyxy:392, xyxy2tblr:410, box_candidates:342,
valid_bbox:358) so that loss/decode values match bit-for-bit where possible.

All functions accept arrays whose last dimension is 4 and broadcast over
leading dims; they work with either jnp or np inputs (returning the
corresponding array type via the jnp namespace).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "xyxy2xywh",
    "xywh2xyxy",
    "xyxy2xywhn",
    "xywhn2xyxy",
    "tblr2xyxy",
    "xyxy2tblr",
    "box_candidates",
    "unletterbox_boxes",
]


def xyxy2xywh(boxes):
    """[xmin, ymin, xmax, ymax] -> [cx, cy, w, h]."""
    xy = (boxes[..., 0:2] + boxes[..., 2:4]) * 0.5
    wh = boxes[..., 2:4] - boxes[..., 0:2]
    return jnp.concatenate([xy, wh], axis=-1)


def xywh2xyxy(boxes):
    """[cx, cy, w, h] -> [xmin, ymin, xmax, ymax]."""
    half = boxes[..., 2:4] * 0.5
    mins = boxes[..., 0:2] - half
    maxs = boxes[..., 0:2] + half
    return jnp.concatenate([mins, maxs], axis=-1)


def xyxy2xywhn(boxes, img_wh):
    """xyxy -> xywh normalized by image size ``img_wh = (w, h)``."""
    w, h = img_wh
    scale = jnp.asarray([w, h, w, h], dtype=jnp.result_type(boxes, jnp.float32))
    return xyxy2xywh(boxes) / scale


def xywhn2xyxy(boxes, img_wh):
    """normalized xywh -> absolute xyxy for image size ``img_wh = (w, h)``."""
    w, h = img_wh
    scale = jnp.asarray([w, h, w, h], dtype=jnp.result_type(boxes, jnp.float32))
    return xywh2xyxy(boxes * scale)


def tblr2xyxy(tblr, grid_xy):
    """[t, b, l, r] distances from grid points -> xyxy.

    tblr: (..., N, 4); grid_xy: (N, 2). Mirrors utils/bbox_tools.py:392-407.
    """
    t, b, l, r = jnp.split(tblr, 4, axis=-1)
    gx = grid_xy[..., 0:1]
    gy = grid_xy[..., 1:2]
    return jnp.concatenate([gx - l, gy - t, gx + r, gy + b], axis=-1)


def xyxy2tblr(xyxy, grid_xy):
    """xyxy -> [t, b, l, r] distances from grid points (utils/bbox_tools.py:410-426)."""
    xmin, ymin, xmax, ymax = jnp.split(xyxy, 4, axis=-1)
    gx = grid_xy[..., 0:1]
    gy = grid_xy[..., 1:2]
    return jnp.concatenate([gy - ymin, ymax - gy, gx - xmin, xmax - gx], axis=-1)


def box_candidates(box1, box2, wh_thr=2.0, ar_thr=20.0, area_thr=0.1):
    """Keep-mask for augmented boxes (box1 = before warp, box2 = after).

    Both are (..., 4) xyxy. Mirrors utils/bbox_tools.py:342-355.
    """
    w1 = box1[..., 2] - box1[..., 0]
    h1 = box1[..., 3] - box1[..., 1]
    w2 = box2[..., 2] - box2[..., 0]
    h2 = box2[..., 3] - box2[..., 1]
    ar = jnp.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
    return (
        (w2 > wh_thr)
        & (h2 > wh_thr)
        & (w2 * h2 / (w1 * h1 + 1e-16) > area_thr)
        & (ar < ar_thr)
    )


def unletterbox_boxes(boxes, scale, pad_left, pad_top, org_w, org_h):
    """Map letterboxed-image xyxy boxes back to original-image coordinates.

    Inverse of the letterbox transform (utils/bbox_tools.py:38-49 applies the
    forward direction). ``scale``/pads may be scalars or broadcastable arrays.
    """
    x1 = (boxes[..., 0] - pad_left) / scale
    y1 = (boxes[..., 1] - pad_top) / scale
    x2 = (boxes[..., 2] - pad_left) / scale
    y2 = (boxes[..., 3] - pad_top) / scale
    x1 = jnp.clip(x1, 0, org_w)
    x2 = jnp.clip(x2, 0, org_w)
    y1 = jnp.clip(y1, 0, org_h)
    y2 = jnp.clip(y2, 0, org_h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
