"""Anchor constants and generators.

* YOLOv5/v7 default 3x3 anchors (train_yolov5.py:819).
* RetinaNet pyramid anchors: levels 3-7, size 2^(l+2), 3 ratios x 3 scales,
  center-shifted grid (utils/anchor.py:59-157). Generated once on host as
  numpy constants and shipped to device — anchors never change during a run,
  so there is no on-device generation path.
"""

from __future__ import annotations

import numpy as np

__all__ = ["YOLOV5_ANCHORS", "make_grid", "pyramid_anchors", "feature_map_shape"]

# (stage, anchor, wh) in input-image pixels for strides 8/16/32.
YOLOV5_ANCHORS = np.array(
    [
        [[10, 13], [16, 30], [33, 23]],
        [[30, 61], [62, 45], [59, 119]],
        [[116, 90], [156, 198], [373, 326]],
    ],
    dtype=np.float32,
)


def make_grid(h: int, w: int) -> np.ndarray:
    """(h, w, 2) array of [x, y] cell coordinates (trainer/eval_yolov5.py:229-234)."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return np.stack([xs, ys], axis=-1).astype(np.float32)


def feature_map_shape(img_shape, pyramid_level: int) -> np.ndarray:
    """Conv-pyramid output shape: ceil(img / 2^level) (utils/anchor.py:50-56)."""
    img_shape = np.asarray(img_shape)
    return (img_shape - 1) // (2**pyramid_level) + 1


def _base_anchors(size: float, ratios: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """(A, 4) xyxy anchors centered at origin (utils/anchor.py:90-104)."""
    num = len(scales) * len(ratios)
    out = np.zeros((num, 4))
    out[:, 2:] = size * np.tile(scales, (2, len(ratios))).T
    areas = out[:, 2] * out[:, 3]
    out[:, 2] = np.sqrt(areas / np.repeat(ratios, len(scales)))
    out[:, 3] = out[:, 2] * np.repeat(ratios, len(scales))
    out[:, 0::2] -= np.tile(out[:, 2], (2, 1)).T * 0.5
    out[:, 1::2] -= np.tile(out[:, 3], (2, 1)).T * 0.5
    return out


def pyramid_anchors(
    img_shape,
    pyramid_levels=(3, 4, 5, 6, 7),
    ratios=(0.5, 1.0, 2.0),
    scales=(1.0, 2 ** (1 / 3), 2 ** (2 / 3)),
) -> np.ndarray:
    """All RetinaNet anchors for an image shape, (sum_l H_l*W_l*9, 4) xyxy."""
    ratios = np.asarray(ratios, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    chunks = []
    for level in pyramid_levels:
        stride = 2**level
        size = 2 ** (level + 2)
        fm = feature_map_shape(img_shape, level)
        base = _base_anchors(size, ratios, scales)
        shift_x = (np.arange(0, fm[1]) + 0.5) * stride
        shift_y = (np.arange(0, fm[0]) + 0.5) * stride
        sx, sy = np.meshgrid(shift_x, shift_y)
        shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
        all_anchors = (shifts[:, None, :] + base[None, :, :]).reshape(-1, 4)
        chunks.append(all_anchors)
    return np.concatenate(chunks, axis=0).astype(np.float32)
