"""IoU family, pure jnp.

Numerics (eps values, clamping order) match the reference:
utils/bbox_tools.py — pairwise_iou:164-190 (eps 1e-9), giou:193-229 (eps 1e-6),
diou:232-283 (eps 1e-6, clipped to [-1, 1]), ciou:286-339 (eps 1e-9,
arctan aspect term with stop-gradient alpha).

Elementwise variants broadcast over any leading dims; pairwise_iou contracts
(..., N, 4) x (..., M, 4) -> (..., N, M).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["pairwise_iou", "iou", "giou", "diou", "ciou"]


def pairwise_iou(boxes1, boxes2):
    """(..., N, 4) x (..., M, 4) -> (..., N, M) IoU, xyxy format."""
    area1 = (boxes1[..., 2] - boxes1[..., 0]) * (boxes1[..., 3] - boxes1[..., 1])
    area2 = (boxes2[..., 2] - boxes2[..., 0]) * (boxes2[..., 3] - boxes2[..., 1])

    lt = jnp.maximum(boxes1[..., :, None, 0:2], boxes2[..., None, :, 0:2])
    rb = jnp.minimum(boxes1[..., :, None, 2:4], boxes2[..., None, :, 2:4])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / jnp.clip(union, 1e-9)


def _inter_union(boxes1, boxes2):
    lt = jnp.maximum(boxes1[..., 0:2], boxes2[..., 0:2])
    rb = jnp.minimum(boxes1[..., 2:4], boxes2[..., 2:4])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area1 = (boxes1[..., 2] - boxes1[..., 0]) * (boxes1[..., 3] - boxes1[..., 1])
    area2 = (boxes2[..., 2] - boxes2[..., 0]) * (boxes2[..., 3] - boxes2[..., 1])
    union = area1 + area2 - inter
    return inter, union


def iou(boxes1, boxes2):
    """Elementwise IoU over broadcastable (..., 4) xyxy boxes."""
    inter, union = _inter_union(boxes1, boxes2)
    return inter / jnp.clip(union, 1e-9)


def _enclosing_wh(boxes1, boxes2):
    c_lt = jnp.minimum(boxes1[..., 0:2], boxes2[..., 0:2])
    c_rb = jnp.maximum(boxes1[..., 2:4], boxes2[..., 2:4])
    c = c_rb - c_lt
    return c[..., 0], c[..., 1]


def giou(boxes1, boxes2):
    """Elementwise Generalized IoU (utils/bbox_tools.py:193-229, eps 1e-6)."""
    inter, union = _inter_union(boxes1, boxes2)
    i = inter / jnp.clip(union, 1e-6)
    cw, ch = _enclosing_wh(boxes1, boxes2)
    c_area = cw * ch
    return i - jnp.abs(c_area - union) / jnp.abs(jnp.clip(c_area, 1e-6))


def diou(boxes1, boxes2):
    """Elementwise Distance IoU (utils/bbox_tools.py:232-283, eps 1e-6)."""
    inter, union = _inter_union(boxes1, boxes2)
    i = inter / jnp.clip(union, 1e-6)
    cw, ch = _enclosing_wh(boxes1, boxes2)
    c_diag = cw**2 + ch**2
    ctr1 = (boxes1[..., 0:2] + boxes1[..., 2:4]) * 0.5
    ctr2 = (boxes2[..., 0:2] + boxes2[..., 2:4]) * 0.5
    d = ctr1 - ctr2
    dist = d[..., 0] ** 2 + d[..., 1] ** 2
    return jnp.clip(i - dist / jnp.clip(c_diag, 1e-6), -1.0, 1.0)


def ciou(boxes1, boxes2):
    """Elementwise Complete IoU (utils/bbox_tools.py:286-339, eps 1e-9).

    The aspect-ratio weight ``alpha`` is computed under stop_gradient, matching
    the reference's ``with torch.no_grad()`` block.
    """
    eps = 1e-9
    w1 = boxes1[..., 2] - boxes1[..., 0]
    h1 = boxes1[..., 3] - boxes1[..., 1]
    w2 = boxes2[..., 2] - boxes2[..., 0]
    h2 = boxes2[..., 3] - boxes2[..., 1]

    inter, union = _inter_union(boxes1, boxes2)
    i = inter / jnp.clip(union, eps)

    cw, ch = _enclosing_wh(boxes1, boxes2)
    c_diag = cw**2 + ch**2

    ctr1 = (boxes1[..., 0:2] + boxes1[..., 2:4]) * 0.5
    ctr2 = (boxes2[..., 0:2] + boxes2[..., 2:4]) * 0.5
    d = ctr1 - ctr2
    dist = d[..., 0] ** 2 + d[..., 1] ** 2

    v = (4.0 / math.pi**2) * (
        jnp.arctan(w1 / jnp.clip(h1, eps)) - jnp.arctan(w2 / jnp.clip(h2, eps))
    ) ** 2
    alpha = jax.lax.stop_gradient(v / jnp.clip(1.0 - i + v, eps))
    return i - (dist / jnp.clip(c_diag, eps) + v * alpha)
