"""Weighted Boxes Fusion (host-side numpy).

Rebuild of utils/weighted_fusion_bbox.py:41-96: per class, greedily cluster
boxes by IoU >= threshold against the running fusion set (processed in
descending score order), fuse each cluster into a score-weighted average
box with a model-weight-normalized score. The alternative to NMS when
merging TTA/model-ensemble predictions (`wfb: true`, trainer/eval_yolov5.py
do_wfb:44-92).

This is an optional host post-process (sequential clustering doesn't map to
the TPU profitably at NMS candidate counts); the hot path stays the
on-device greedy NMS.
"""

from __future__ import annotations

import numpy as np

from .metrics import pairwise_iou_np

__all__ = ["weighted_boxes_fusion"]


def _fuse_cluster(cluster: np.ndarray) -> np.ndarray:
    """cluster (N, 7) [x1,y1,x2,y2,score,cls,weight] -> fused (6,)."""
    boxes = cluster[:, :4]
    scores = cluster[:, 4]
    weights = cluster[:, 6]
    fused_box = np.sum(boxes * scores[:, None], axis=0) / np.sum(scores)
    fused_score = np.sum(scores * weights) / np.sum(weights)
    return np.concatenate([fused_box, [fused_score, cluster[0, 5]]])


def weighted_boxes_fusion(boxes_list, weights=None, iou_thr: float = 0.5,
                          skip_box_thr: float = 0.0):
    """Fuse per-model detection lists.

    boxes_list: list (per model) of (N_i, 6) [x1,y1,x2,y2,score,cls] arrays.
    weights: per-model weights (default 1).
    Returns (M, 6) fused detections sorted by score descending.
    """
    if weights is None:
        weights = [1.0] * len(boxes_list)
    rows = []
    for dets, w in zip(boxes_list, weights):
        dets = np.asarray(dets, dtype=np.float64)
        if len(dets) == 0:
            continue
        dets = dets[dets[:, 4] > skip_box_thr]
        if len(dets) == 0:
            continue
        rows.append(
            np.concatenate([dets, np.full((len(dets), 1), w)], axis=1)
        )
    if not rows:
        return np.zeros((0, 6))
    all_boxes = np.concatenate(rows, axis=0)

    fused_out = []
    for cls in np.unique(all_boxes[:, 5]):
        group = all_boxes[all_boxes[:, 5] == cls]
        order = np.argsort(group[:, 4])[::-1]
        clusters: list[list[np.ndarray]] = []
        fused: list[np.ndarray] = []
        for i in order:
            cur = group[i]
            if fused:
                ious = pairwise_iou_np(
                    cur[None, :4], np.asarray(fused)[:, :4]
                )[0]
                hit = np.nonzero(ious >= iou_thr)[0]
            else:
                hit = np.zeros((0,), dtype=int)
            if len(hit) == 0:
                clusters.append([cur])
                fused.append(_fuse_cluster(np.asarray([cur])))
            else:
                for j in hit:
                    clusters[j].append(cur)
                    fused[j] = _fuse_cluster(np.asarray(clusters[j]))
        fused_out.extend(fused)
    out = np.asarray(fused_out)
    return out[np.argsort(out[:, 4])[::-1]]
