"""FCOS loss — per-level range assignment + center sampling + centerness.

Dense rebuild of loss/fcos_loss.py:18-339:

* grids: pixel centers idx*stride + stride//2 (:320-339),
* positives per level: location inside the gt box (:288-302), optionally
  inside the center-sampling box (radius*stride clipped to the gt,
  :230-262), and max(ltrb) within the level's regression range
  [[-1,64],[64,128],[128,256],[256,512],[512,inf]] (:290-302),
* one gt per location: minimum area wins (:264-288),
* targets: ltrb/stride; centerness = sqrt(min/max_lr * min/max_tb),
* losses (:120-167): (neg-log / linear / g)IoU on ltrb summed / pos_num —
  the reference's centerness weighting self-cancels via a (m,1)x(m,)
  broadcast (see the regression block below), focal-factored
  BCE for centerness (sum/pos) and class (mean(-1).sum/pos, label-smoothed),
  per-image means -> per-stage means -> stage mean x weights x batch.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

from .common import bce_with_logits, focal_loss_factor, smooth_bce_targets

__all__ = ["FCOSLossConfig", "fcos_loss"]

INF = 1e8


@dataclasses.dataclass(frozen=True)
class FCOSLossConfig:
    num_class: int
    input_size: tuple = (640, 640)
    strides: tuple = (8, 16, 32, 64, 128)
    center_sampling_radius: float = 1.5
    do_center_sampling: bool = True
    iou_type: str = "giou"  # 'iou' | 'linear_iou' | 'giou'
    cls_loss_weight: float = 1.0
    reg_loss_weight: float = 1.0
    ctr_loss_weight: float = 1.0
    cls_pos_weight: float = 1.0
    ctr_pos_weight: float = 1.0
    class_smooth_factor: float = 0.0
    eps: float = 1e-6
    focal_loss_gamma: float = 1.5
    focal_loss_alpha: float = 0.25
    image_chunk: int = 8


def _regression_ranges(num_levels: int, strides):
    """[[-1, 64], [64, 128], ..., [last/2, INF]] (loss/fcos_loss.py:288-302)."""
    out = []
    for i, s in enumerate(strides[:num_levels]):
        t = math.log2(s) + 3
        if i == 0:
            out.append((-1.0, 2.0**t))
        elif i == num_levels - 1:
            out.append((2.0 ** (t - 1), INF))
        else:
            out.append((2.0 ** (t - 1), 2.0**t))
    return out


def _iou_loss_ltrb(pred, tar, iou_type, eps):
    """(…, 4) [l, t, r, b] IoU losses (loss/fcos_loss.py:42-80)."""
    pl, pt, pr, pb = pred[..., 0], pred[..., 1], pred[..., 2], pred[..., 3]
    tl, tt, tr, tb = tar[..., 0], tar[..., 1], tar[..., 2], tar[..., 3]
    tar_area = (tl + tr) * (tt + tb)
    pred_area = (pl + pr) * (pt + pb)
    w_inter = jnp.clip(jnp.minimum(pl, tl) + jnp.minimum(pr, tr), 0.0)
    h_inter = jnp.clip(jnp.minimum(pb, tb) + jnp.minimum(pt, tt), 0.0)
    gw = jnp.maximum(pl, tl) + jnp.maximum(pr, tr)
    gh = jnp.maximum(pb, tb) + jnp.maximum(pt, tt)
    ac = jnp.clip(gw * gh, eps)
    inter = w_inter * h_inter
    union = jnp.clip(tar_area + jnp.clip(pred_area, 0.0) - inter, eps)
    iou = inter / union
    if iou_type == "iou":
        return -jnp.log(jnp.clip(iou, eps))
    if iou_type == "linear_iou":
        return 1.0 - iou
    giou = iou - (ac - union) / ac
    return 1.0 - giou


def _assign_level(grid_px, tar_xyxy, tar_valid, stride, rng_lo, rng_hi, cfg):
    """One image, one level. grid_px (P, 2); targets (M, ...).

    Returns pos (P,), matched gt (P,), reg targets (P, 4)/stride,
    centerness targets (P,)."""
    l = grid_px[:, None, 0] - tar_xyxy[None, :, 0]  # (P, M)
    t = grid_px[:, None, 1] - tar_xyxy[None, :, 1]
    r = tar_xyxy[None, :, 2] - grid_px[:, None, 0]
    b = tar_xyxy[None, :, 3] - grid_px[:, None, 1]
    ltrb = jnp.stack([l, t, r, b], axis=-1)  # (P, M, 4)
    in_box = jnp.all(ltrb > 0.0, axis=-1) & tar_valid[None, :]

    if cfg.do_center_sampling:
        cx = (tar_xyxy[:, 0] + tar_xyxy[:, 2]) * 0.5
        cy = (tar_xyxy[:, 1] + tar_xyxy[:, 3]) * 0.5
        rad = cfg.center_sampling_radius * stride
        x1 = jnp.maximum(cx - rad, tar_xyxy[:, 0])
        y1 = jnp.maximum(cy - rad, tar_xyxy[:, 1])
        x2 = jnp.minimum(cx + rad, tar_xyxy[:, 2])
        y2 = jnp.minimum(cy + rad, tar_xyxy[:, 3])
        in_ctr = (
            (grid_px[:, None, 0] - x1[None, :] > 0)
            & (grid_px[:, None, 1] - y1[None, :] > 0)
            & (x2[None, :] - grid_px[:, None, 0] > 0)
            & (y2[None, :] - grid_px[:, None, 1] > 0)
        ) & tar_valid[None, :]
        in_box = in_box & in_ctr

    max_ltrb = jnp.max(ltrb, axis=-1)  # (P, M)
    cared = (max_ltrb >= rng_lo) & (max_ltrb <= rng_hi)

    area = (tar_xyxy[:, 2] - tar_xyxy[:, 0]) * (tar_xyxy[:, 3] - tar_xyxy[:, 1])
    area = jnp.where(tar_valid, area, INF)
    area_pn = jnp.where(in_box & cared, area[None, :], INF)  # (P, M)
    matched = jnp.argmin(area_pn, axis=-1)  # (P,)
    pos = jnp.min(area_pn, axis=-1) < INF  # (P,)

    reg_tar = jnp.take_along_axis(ltrb, matched[:, None, None], axis=1)[:, 0, :]
    reg_tar = reg_tar / stride  # (P, 4)
    lr_min = jnp.minimum(reg_tar[:, 0], reg_tar[:, 2])
    lr_max = jnp.maximum(reg_tar[:, 0], reg_tar[:, 2])
    tb_min = jnp.minimum(reg_tar[:, 1], reg_tar[:, 3])
    tb_max = jnp.maximum(reg_tar[:, 1], reg_tar[:, 3])
    ctr_tar = jnp.sqrt(
        jnp.clip(lr_min / jnp.clip(lr_max, cfg.eps), 0.0)
        * jnp.clip(tb_min / jnp.clip(tb_max, cfg.eps), 0.0)
    )
    return pos, matched, reg_tar, ctr_tar


def fcos_loss(
    cls_fms: Sequence[jnp.ndarray],
    reg_fms: Sequence[jnp.ndarray],
    ctr_fms: Sequence[jnp.ndarray],
    targets: jnp.ndarray,
    cfg: FCOSLossConfig,
):
    """cls/reg/ctr_fms: per-level NHWC maps (B, H, W, nc|4|1);
    targets (B, M, 6). Returns loss dict (no balance state)."""
    B = targets.shape[0]
    nc = cfg.num_class
    num_levels = len(cls_fms)
    pos_t, neg_t = smooth_bce_targets(cfg.class_smooth_factor)
    ranges = _regression_ranges(num_levels, cfg.strides)

    tar_xyxy = targets[..., 0:4].astype(jnp.float32)
    tar_valid = targets[..., 4] >= 0
    tar_cls = jnp.clip(targets[..., 4].astype(jnp.int32), 0, nc - 1)

    stage_cls, stage_reg, stage_ctr = [], [], []
    tar_num = jnp.zeros(())

    for li in range(num_levels):
        h, w = cls_fms[li].shape[1], cls_fms[li].shape[2]
        stride = cfg.input_size[0] / h
        ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        grid_px = (
            jnp.stack([xs, ys], -1).reshape(-1, 2).astype(jnp.float32) * stride
            + stride // 2
        )
        P = h * w
        lo, hi = ranges[li]

        cls_l = cls_fms[li].astype(jnp.float32).reshape(B, P, nc)
        reg_l = reg_fms[li].astype(jnp.float32).reshape(B, P, 4)
        ctr_l = ctr_fms[li].astype(jnp.float32).reshape(B, P)

        def assign_one(args):
            txy, tv = args
            return _assign_level(grid_px, txy, tv, stride, lo, hi, cfg)

        pos, matched, reg_tar, ctr_tar = jax.lax.map(
            assign_one, (tar_xyxy, tar_valid),
            batch_size=min(cfg.image_chunk, B),
        )
        posf = pos.astype(jnp.float32)  # (B, P)
        n_pos = jnp.sum(posf, axis=-1)  # (B,)
        tar_num += jnp.sum(posf)

        # ---- centerness (per image: focal BCE sum / pos_num)
        t_ctr = ctr_tar * posf
        bce_ctr_raw = bce_with_logits(ctr_l, t_ctr, cfg.ctr_pos_weight)
        bce_ctr = bce_ctr_raw * focal_loss_factor(
            ctr_l, t_ctr, cfg.focal_loss_gamma, cfg.focal_loss_alpha
        )
        # positives only when present. When a level has NO positives, the
        # reference's fallback passes `target * ctr_focal` INTO the bce
        # (loss/fcos_loss.py:144 — focal scales the all-zero target, a
        # no-op), so it is an UNweighted all-cells mean; replicated.
        ctr_pos = jnp.sum(bce_ctr * posf, axis=-1) / jnp.maximum(n_pos, 1.0)
        ctr_none = jnp.mean(bce_ctr_raw, axis=-1)
        ctr_img = jnp.where(n_pos > 0, ctr_pos, ctr_none)
        stage_ctr.append(jnp.mean(ctr_img))

        # ---- regression IoU loss. The reference intends a
        # centerness-weighted mean, but compute_iou_loss broadcasts a (m, 1)
        # loss against a (m,) weight into (m, m), so
        # (losses * w).sum() / w.sum() == losses.sum() EXACTLY — the
        # weighting cancels (loss/fcos_loss.py:77-78). Replicated: plain
        # sum / pos_num (the outer :134 division).
        iou_l = _iou_loss_ltrb(reg_l, reg_tar, cfg.iou_type, cfg.eps)  # (B, P)
        reg_img = jnp.sum(iou_l * posf, axis=-1) / jnp.maximum(n_pos, 1.0)
        reg_img = jnp.where(n_pos > 0, reg_img, 0.0)
        stage_reg.append(jnp.mean(reg_img))

        # ---- classification (label-smoothed, all cells)
        b_idx = jnp.arange(B)[:, None]
        m_cls = tar_cls[b_idx, matched]  # (B, P)
        t_cls = jnp.where(
            pos[..., None],
            jax.nn.one_hot(m_cls, nc) * (pos_t - neg_t) + neg_t,
            jnp.full((1, 1, nc), neg_t),
        )
        bce_cls = bce_with_logits(cls_l, t_cls, cfg.cls_pos_weight)
        bce_cls = bce_cls * focal_loss_factor(
            cls_l, t_cls, cfg.focal_loss_gamma, cfg.focal_loss_alpha
        )
        cls_img = jnp.sum(jnp.mean(bce_cls, axis=-1), axis=-1) / jnp.maximum(
            n_pos, 1.0
        )
        stage_cls.append(jnp.mean(cls_img))

    cls_loss = jnp.mean(jnp.stack(stage_cls)) * cfg.cls_loss_weight
    reg_loss = jnp.mean(jnp.stack(stage_reg)) * cfg.reg_loss_weight
    ctr_loss = jnp.mean(jnp.stack(stage_ctr)) * cfg.ctr_loss_weight
    tot = (cls_loss + reg_loss + ctr_loss) * B

    return {
        "tot_loss": tot,
        "cls_loss": jax.lax.stop_gradient(cls_loss) * B,
        "reg_loss": jax.lax.stop_gradient(reg_loss) * B,
        "cen_loss": jax.lax.stop_gradient(ctr_loss) * B,
        "tar_nums": jax.lax.stop_gradient(tar_num),
    }
