"""YOLOv8 loss — Task-Aligned assignment (TAL) + CIoU + Distribution Focal
Loss, dense fixed shapes. Rebuild of loss/yolov8_loss.py.

Pipeline (reference line refs):
* DFL integral decode: softmax over reg bins, projected on arange(1, reg+1)
  (NB: 1-indexed bins, :30), tblr -> xyxy in grid units (:104-127),
* candidates: grid centers strictly inside the gt box (:129-152),
* alignment metric = iou^beta * score^alpha (beta 6, alpha 0.5, :154-186),
* top-k (13) grids per gt (:188-211), one-gt-per-grid conflicts resolved by
  max IoU (:200-221),
* cls target = one-hot x normalized metric (:243-281),
* losses: cls-score-weighted CIoU + DFL with left/right CE weighting over
  tblr clamped to [0, reg-1-0.01] (:283-325), cls BCE (+focal factor)
  normalized by the total target score; all x batch_size.

The reference already computes dense (b, M, N) tensors; with N ~= 34k
positions at 640px (the /4 scale dominates) the assignment runs under
lax.map image chunks to bound peak memory.

The reference's interactive ``input()`` on NaN (:71-91) is dropped.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..ops.boxes import tblr2xyxy, xyxy2tblr
from .common import bce_with_logits, focal_loss_factor

__all__ = ["YOLOv8LossConfig", "yolov8_loss", "v8_make_grid", "dfl_decode"]


@dataclasses.dataclass(frozen=True)
class YOLOv8LossConfig:
    num_class: int
    input_size: tuple = (640, 640)
    strides: tuple = (4, 8, 16, 32)
    reg: int = 16
    topk: int = 13
    alpha: float = 0.5  # score exponent
    beta: float = 6.0  # iou exponent
    iou_loss_scale: float = 7.5
    cls_loss_scale: float = 0.5
    dfl_loss_scale: float = 1.5
    cls_pos_weight: float = 1.0
    use_focal_factor: bool = True
    focal_loss_gamma: float = 1.5
    focal_loss_alpha: float = 0.25
    image_chunk: int = 4


def v8_make_grid(input_size, strides):
    """Concatenated (N, 2) cell centers in grid units (+0.5) and (N, 1)
    strides (loss/yolov8_loss.py:327-346)."""
    import numpy as np

    gs, ss = [], []
    for s in strides:
        h, w = input_size[0] // s, input_size[1] // s
        ys, xs = np.meshgrid(
            np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij"
        )
        gs.append(np.stack([xs, ys], axis=-1).reshape(-1, 2))
        ss.append(np.full((h * w, 1), s, dtype=np.float32))
    return (
        jnp.asarray(np.concatenate(gs, 0), jnp.float32),
        jnp.asarray(np.concatenate(ss, 0), jnp.float32),
    )


def dfl_decode(pred_dfl, reg: int):
    """(…, 4*reg) DFL logits -> (…, 4) tblr expectation over bins 1..reg."""
    shape = pred_dfl.shape[:-1]
    p = jax.nn.softmax(pred_dfl.reshape(*shape, 4, reg), axis=-1)
    project = jnp.arange(1, reg + 1, dtype=p.dtype)
    return jnp.sum(p * project, axis=-1)


def _ciou_xyxy(b1, b2, eps=1e-6):
    """Elementwise CIoU on xyxy (loss/yolov8_loss.py:370-410 numerics)."""
    w1 = b1[..., 2] - b1[..., 0]
    h1 = b1[..., 3] - b1[..., 1]
    w2 = b2[..., 2] - b2[..., 0]
    h2 = b2[..., 3] - b2[..., 1]
    inter = jnp.clip(
        jnp.minimum(b1[..., 2], b2[..., 2]) - jnp.maximum(b1[..., 0], b2[..., 0]), 0
    ) * jnp.clip(
        jnp.minimum(b1[..., 3], b2[..., 3]) - jnp.maximum(b1[..., 1], b2[..., 1]), 0
    )
    union = jnp.clip(jnp.clip(w1 * h1, 0) + jnp.clip(w2 * h2, 0) - inter, eps)
    iou = inter / union
    cw = jnp.maximum(b1[..., 2], b2[..., 2]) - jnp.minimum(b1[..., 0], b2[..., 0])
    ch = jnp.maximum(b1[..., 3], b2[..., 3]) - jnp.minimum(b1[..., 1], b2[..., 1])
    diag = jnp.clip(cw**2 + ch**2, eps)
    dist = (
        (b1[..., 2] + b1[..., 0] - b2[..., 2] - b2[..., 0]) ** 2
        + (b1[..., 3] + b1[..., 1] - b2[..., 3] - b2[..., 1]) ** 2
    ) / 4.0
    v = 4.0 / math.pi**2 * (
        jnp.arctan(w1 / jnp.clip(h1, eps)) - jnp.arctan(w2 / jnp.clip(h2, eps))
    ) ** 2
    alpha = jax.lax.stop_gradient(v / jnp.clip(1.0 - iou + v, eps))
    return iou - (dist / diag + v * alpha)


def _assign_image(pred_xyxy_px, pred_cls_prob, tar_xyxy, tar_cls, tar_valid,
                  grid_px, cfg: YOLOv8LossConfig):
    """TAL for one image. pred_xyxy_px (N, 4) pixels, pred_cls_prob (N, nc),
    targets (M, …). Returns fg (N,), matched gt idx (N,), norm_metric (N,)."""
    M = tar_xyxy.shape[0]
    N = grid_px.shape[0]

    # grids strictly inside gt boxes (:129-152)
    l = grid_px[None, :, 0] - tar_xyxy[:, None, 0]
    t = grid_px[None, :, 1] - tar_xyxy[:, None, 1]
    r = tar_xyxy[:, None, 2] - grid_px[None, :, 0]
    b = tar_xyxy[:, None, 3] - grid_px[None, :, 1]
    in_gt = (
        jnp.minimum(jnp.minimum(l, t), jnp.minimum(r, b)) > 1e-9
    ) & tar_valid[:, None]  # (M, N)

    # alignment metric (:154-186)
    iou = jnp.clip(
        _ciou_xyxy(tar_xyxy[:, None, :], pred_xyxy_px[None, :, :]), 0.0
    )
    iou = jnp.where(in_gt, iou, 0.0)
    score = pred_cls_prob[:, tar_cls].T  # (M, N): prob of each gt's class
    score = jnp.where(in_gt, score, 0.0)
    metric = iou**cfg.beta * score**cfg.alpha  # (M, N)

    # top-k grids per gt (:188-211)
    k = min(cfg.topk, N)
    kth = jax.lax.top_k(metric, k)[0][:, -1:]  # (M, 1) k-th largest
    mask_topk = (metric >= jnp.maximum(kth, 1e-12)) & (metric > 0)
    mask_topk &= tar_valid[:, None]

    # one gt per grid: conflicts go to max-iou gt (:200-221)
    col_hits = jnp.sum(mask_topk, axis=0)
    max_iou_gt = jnp.argmax(iou, axis=0)  # (N,)
    winner = jnp.arange(M)[:, None] == max_iou_gt[None, :]
    mask_assign = jnp.where(col_hits[None, :] > 1, mask_topk & winner, mask_topk)

    fg = jnp.any(mask_assign, axis=0)  # (N,)
    matched_gt = jnp.argmax(mask_assign, axis=0)  # (N,)

    # normalized metric for cls targets (:274-277)
    metric_m = metric * mask_assign
    iou_m = iou * mask_assign
    norm = (
        metric_m * jnp.max(iou_m, axis=-1, keepdims=True)
        / (jnp.max(metric_m, axis=-1, keepdims=True) + 1e-9)
    )
    norm_metric = jnp.max(norm, axis=0)  # (N,)
    return fg, matched_gt, norm_metric


def yolov8_loss(
    stage_preds: Dict[str, jnp.ndarray] | Sequence[jnp.ndarray],
    targets: jnp.ndarray,
    balances: jnp.ndarray,
    cfg: YOLOv8LossConfig,
):
    """stage_preds: 4 NHWC maps (B, H, W, 4*reg+nc); targets (B, M, 6)."""
    if isinstance(stage_preds, dict):
        stage_preds = list(stage_preds.values())
    B = targets.shape[0]
    nc = cfg.num_class
    reg = cfg.reg

    grids, strides_col = v8_make_grid(cfg.input_size, cfg.strides)  # (N,2),(N,1)
    grid_px = grids * strides_col  # cell centers in pixels

    flat = []
    for pred in stage_preds:
        b, h, w, c = pred.shape
        flat.append(pred.astype(jnp.float32).reshape(b, h * w, c))
    all_preds = jnp.concatenate(flat, axis=1)  # (B, N, 4*reg+nc)
    pred_dfl = all_preds[..., : 4 * reg]
    pred_cls = all_preds[..., 4 * reg :]

    pred_tblr = dfl_decode(pred_dfl, reg)  # (B, N, 4) grid units
    pred_xyxy = tblr2xyxy(pred_tblr, grids)  # grid units
    pred_xyxy_px = pred_xyxy * strides_col[None]  # pixels

    tar_xyxy = targets[..., 0:4].astype(jnp.float32)
    tar_valid = targets[..., 4] >= 0
    tar_cls = jnp.clip(targets[..., 4].astype(jnp.int32), 0, nc - 1)

    pred_cls_prob = jax.nn.sigmoid(jax.lax.stop_gradient(pred_cls))

    def assign_one(args):
        pxy, pcp, txy, tc, tv = args
        return _assign_image(pxy, pcp, txy, tc, tv, grid_px, cfg)

    fg, matched_gt, norm_metric = jax.lax.map(
        assign_one,
        (jax.lax.stop_gradient(pred_xyxy_px), pred_cls_prob, tar_xyxy, tar_cls, tar_valid),
        batch_size=min(cfg.image_chunk, B),
    )
    # fg (B, N); matched_gt (B, N); norm_metric (B, N)
    fgf = fg.astype(jnp.float32)

    b_idx = jnp.arange(B)[:, None]
    m_cls = tar_cls[b_idx, matched_gt]  # (B, N)
    m_box = tar_xyxy[b_idx, matched_gt]  # (B, N, 4) pixels

    cls_score = (
        jax.nn.one_hot(m_cls, nc) * (norm_metric * fgf)[..., None]
    )  # (B, N, nc)
    tar_score_sum = jnp.maximum(jnp.sum(cls_score), 1.0)

    # ---- classification (:57-64)
    bce = bce_with_logits(pred_cls, cls_score, cfg.cls_pos_weight)
    if cfg.use_focal_factor:
        bce = bce * focal_loss_factor(
            pred_cls, cls_score, cfg.focal_loss_gamma, cfg.focal_loss_alpha
        )
    cls_loss = jnp.sum(bce) / tar_score_sum

    # ---- CIoU, weighted by per-grid target score (:283-305)
    box_grid = m_box / strides_col[None]  # grid units
    iou_val = _ciou_xyxy(pred_xyxy, box_grid)
    weight = jnp.sum(cls_score, axis=-1)  # (B, N)
    iou_loss = jnp.sum((1.0 - iou_val) * weight * fgf) / tar_score_sum

    # ---- DFL (:307-325)
    tar_tblr = jnp.clip(
        xyxy2tblr(box_grid, grids), 0.0, reg - 1 - 0.01
    )  # (B, N, 4)
    tl = jnp.floor(tar_tblr).astype(jnp.int32)  # left bin
    wr = tar_tblr - tl  # right weight
    wl = 1.0 - wr
    logp = jax.nn.log_softmax(
        pred_dfl.reshape(B, -1, 4, reg), axis=-1
    )  # (B, N, 4, reg)
    ce_l = -jnp.take_along_axis(logp, tl[..., None], axis=-1)[..., 0]
    ce_r = -jnp.take_along_axis(
        logp, jnp.minimum(tl + 1, reg - 1)[..., None], axis=-1
    )[..., 0]
    dfl = ce_l * wl + ce_r * wr  # (B, N, 4)
    dfl_loss = jnp.sum(jnp.mean(dfl, axis=-1) * weight * fgf) / tar_score_sum

    cls_loss = cls_loss * cfg.cls_loss_scale * B
    iou_loss = iou_loss * cfg.iou_loss_scale * B
    dfl_loss = dfl_loss * cfg.dfl_loss_scale * B
    tot = cls_loss + iou_loss + dfl_loss

    loss_dict = {
        "tot_loss": tot,
        "cls_loss": jax.lax.stop_gradient(cls_loss),
        "iou_loss": jax.lax.stop_gradient(iou_loss),
        "dfl_loss": jax.lax.stop_gradient(dfl_loss),
        "tar_nums": jnp.sum(fgf),
    }
    return loss_dict, balances
