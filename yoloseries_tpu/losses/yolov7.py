"""YOLOv7 loss — two-stage assignment: YOLOv5 match then SimOTA refinement.

Rebuild of loss/yolov7_loss.py:17-402:

* stage 1 (:166-245): the exact YOLOv5 anchor-ratio + cross-grid match
  (reused dense lattice from losses.yolov5), producing the candidate pool,
* stage 2 (:245-383): per image, SimOTA over the pooled candidates —
  cost = 3 * (-log iou) + cls BCE on logit(sqrt(cls*cof)); dynamic-k is the
  clamped SUM OF THE TOP-K NEG-LOG-IOU values (:317-319 — the reference
  sums loss magnitudes, not IoUs; replicated for parity), per-position
  conflicts go to the min-cost gt,
* losses: label-smoothed cls BCE (smooth_bce eps 0.1, :11-13), CIoU, conf
  BCE over all cells with sum/num_targets normalization (NOT mean — :151),
  objectness target = clamped IoU or 1.0 via ``use_iou_as_tar_cof``
  (:133-136), same EMA balances and scale factors as v5.

Dense formulation: the candidate pool per image/stage is the flattened
(M, A, 5) v5 lattice (C = M*A*5 slots, masked); the SimOTA pair matrices
are (M, C) per image, run under lax.map chunks.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..ops.boxes import xywh2xyxy, xyxy2xywhn
from ..ops.iou import ciou, pairwise_iou
from .common import bce_with_logits, focal_loss_factor, smooth_bce_targets
from .yolov5 import _assign_stage_thr

__all__ = ["YOLOv7LossConfig", "yolov7_loss"]


@dataclasses.dataclass(frozen=True)
class YOLOv7LossConfig:
    num_class: int
    input_size: tuple = (640, 640)
    strides: tuple = (8, 16, 32)
    anchor_match_thr: float = 4.0
    topk: int = 10
    iou_loss_scale: float = 0.05
    cls_loss_scale: float = 0.5
    cof_loss_scale: float = 1.0
    cls_pos_weight: float = 1.0
    cof_pos_weight: float = 1.0
    label_smoothing: float = 0.1
    use_iou_as_tar_cof: bool = True
    use_focal_loss: bool = False
    focal_loss_gamma: float = 1.5
    focal_loss_alpha: float = 0.25
    image_chunk: int = 8


def _ota_refine_image(cand_mask, cand_box_px, cand_cof, cand_cls,
                      gt_xyxy, gt_cls, gt_valid, cfg: YOLOv7LossConfig):
    """SimOTA refinement for one image, one stage.

    cand_mask (C,) bool — live v5 candidates; cand_box_px (C, 4) decoded
    candidate boxes in pixels (xyxy); cand_cof (C,), cand_cls (C, nc) raw
    logits; gt_* the (M,)-padded targets in pixels.

    Returns keep (C,) bool and matched gt index (C,).
    """
    nc = cfg.num_class
    M = gt_xyxy.shape[0]
    C = cand_mask.shape[0]
    eps = 1e-9

    iou = pairwise_iou(gt_xyxy, cand_box_px)  # (M, C)
    pair_live = gt_valid[:, None] & cand_mask[None, :]
    iou = jnp.where(pair_live, iou, 0.0)
    neg_iou_loss = -jnp.log(iou + eps)

    # dynamic-k from the sum of top-k neg-log-iou values (reference :315-316).
    # The reference clamps to topk_iou_loss.size(1) == min(topk, Xp) — i.e.
    # the static k — NOT the live-candidate count; the neg-log-iou sum easily
    # exceeds k early in training, so the upper bound matters.
    k = min(cfg.topk, C)
    topk_loss, _ = jax.lax.top_k(jnp.where(pair_live, neg_iou_loss, -jnp.inf), k)
    topk_loss = jnp.where(jnp.isfinite(topk_loss), topk_loss, 0.0)
    dynamic_k = jnp.clip(jnp.sum(topk_loss, axis=1).astype(jnp.int32), 1, k)  # (M,)

    # pairwise cls cost on logit(sqrt(cls*cof)) (:330-345)
    joint = jnp.sqrt(
        jnp.clip(
            jax.nn.sigmoid(cand_cls) * jax.nn.sigmoid(cand_cof)[:, None], eps, 1 - eps
        )
    )  # (C, nc)
    joint_logit = jnp.log(joint / (1.0 - joint))
    t_onehot = jax.nn.one_hot(gt_cls, nc)  # (M, nc)
    cls_cost = jnp.sum(
        bce_with_logits(joint_logit[None, :, :], t_onehot[:, None, :]), axis=-1
    )  # (M, C)

    cost = 3.0 * neg_iou_loss + cls_cost
    cost = jnp.where(pair_live, cost, jnp.inf)

    order = jnp.argsort(cost, axis=1)
    rank = jnp.argsort(order, axis=1)
    matching = (rank < dynamic_k[:, None]) & pair_live & jnp.isfinite(cost)

    # conflict columns are REASSIGNED to the global min-cost gt (the
    # reference zeroes the column then writes cost_min_idx,
    # loss/yolov7_loss.py:348-351 — not an intersection with prior matches)
    col_hits = jnp.sum(matching, axis=0)
    winner = jnp.argmin(jnp.where(jnp.isfinite(cost), cost, 1e30), axis=0)
    winner_mat = (jnp.arange(M)[:, None] == winner[None, :]) & jnp.isfinite(cost)
    matching = jnp.where(col_hits[None, :] > 1, winner_mat, matching)

    keep = jnp.any(matching, axis=0)  # (C,)
    matched_gt = jnp.argmax(matching, axis=0)  # (C,)
    return keep, matched_gt


def yolov7_loss(
    stage_preds: Dict[str, jnp.ndarray] | Sequence[jnp.ndarray],
    targets: jnp.ndarray,
    anchors: jnp.ndarray,
    balances: jnp.ndarray,
    cfg: YOLOv7LossConfig,
):
    """stage_preds: NHWC maps (B, H, W, A*(5+nc)); targets (B, M, 6);
    anchors (num_stages, A, 2) px. Returns (loss_dict, new_balances)."""
    if isinstance(stage_preds, dict):
        stage_preds = list(stage_preds.values())
    num_stages = len(stage_preds)
    B, M = targets.shape[0], targets.shape[1]
    nc = cfg.num_class
    na = anchors.shape[1]
    h_in, w_in = cfg.input_size
    pos_t, neg_t = smooth_bce_targets(cfg.label_smoothing)

    gt_valid = targets[..., 4] >= 0
    gt_xyxy = targets[..., 0:4].astype(jnp.float32)
    t_xywhn = xyxy2xywhn(gt_xyxy, (w_in, h_in))
    gt_cls = jnp.clip(targets[..., 4].astype(jnp.int32), 0, nc - 1)

    s = 3.0 / num_stages
    iou_loss = jnp.zeros(())
    cls_loss = jnp.zeros(())
    cof_loss = jnp.zeros(())
    tar_num = jnp.zeros(())
    new_balances = []

    for i, pred in enumerate(stage_preds):
        fm_h, fm_w = pred.shape[1], pred.shape[2]
        stride = w_in / fm_w
        anchors_stage = (anchors[i] / stride).astype(jnp.float32)
        # keep the model's compute dtype for the big map; only the gathered
        # candidate rows and the objectness slice are cast to f32
        pred = pred.reshape(B, fm_h, fm_w, na, 5 + nc)

        scale = jnp.array([fm_w, fm_h, fm_w, fm_h], jnp.float32)
        a = _assign_stage_thr(
            t_xywhn.astype(jnp.float32) * scale, gt_valid, anchors_stage,
            fm_w, fm_h, cfg.anchor_match_thr,
        )
        v5_mask = a["mask"]  # (B, M, A, 5)

        # gather candidate predictions
        flat_cell = (a["gy"] * fm_w + a["gx"]) * na  # (B, M, 5)
        flat_idx = flat_cell[:, :, None, :] + jnp.arange(na)[None, None, :, None]
        pred_flat = pred.reshape(B, fm_h * fm_w * na, 5 + nc)
        idx2 = flat_idx.reshape(B, -1)
        cur = jnp.take_along_axis(pred_flat, idx2[..., None], axis=1)
        # (B, M, A, 5off, 85)
        cur = cur.reshape(B, M, na, 5, 5 + nc).astype(jnp.float32)

        # decoded candidate boxes in pixels for the OTA cost (:283-295)
        grid_xy = jnp.stack([a["gx"], a["gy"]], axis=-1).astype(jnp.float32)
        grid_xy = jnp.broadcast_to(
            grid_xy[:, :, None, :, :], (B, M, na, 5, 2)
        )
        pxy = (jax.nn.sigmoid(cur[..., 0:2]) * 2.0 - 0.5 + grid_xy) * stride
        pwh = (
            (jax.nn.sigmoid(cur[..., 2:4]) * 2.0) ** 2
            * anchors_stage[None, None, :, None, :]
            * stride
        )
        cand_box_px = xywh2xyxy(jnp.concatenate([pxy, pwh], axis=-1))

        C = M * na * 5
        cand_mask = v5_mask.reshape(B, C)
        cand_box = jax.lax.stop_gradient(cand_box_px.reshape(B, C, 4))
        cand_cof = jax.lax.stop_gradient(cur[..., 4].reshape(B, C))
        cand_cls = jax.lax.stop_gradient(cur[..., 5:].reshape(B, C, nc))

        def refine_one(args):
            cm, cb, cc, ccl, gxy, gc, gv = args
            return _ota_refine_image(cm, cb, cc, ccl, gxy, gc, gv, cfg)

        keep, matched_gt = jax.lax.map(
            refine_one,
            (cand_mask, cand_box, cand_cof, cand_cls, gt_xyxy, gt_cls, gt_valid),
            batch_size=min(cfg.image_chunk, B),
        )  # (B, C) each
        keepf = keep.astype(jnp.float32)
        n_pos = jnp.sum(keepf)
        tar_num += n_pos

        b_idx = jnp.arange(B)[:, None]
        m_cls = gt_cls[b_idx, matched_gt]  # (B, C)
        m_xyxy = gt_xyxy[b_idx, matched_gt]  # (B, C, 4)

        # matched target boxes in stage units rel. to candidate cell (:365-371)
        m_xywhn = xyxy2xywhn(m_xyxy, (w_in, h_in)) * scale
        cell = jnp.stack([a["gx"], a["gy"]], axis=-1).astype(jnp.float32)
        cell = jnp.broadcast_to(cell[:, :, None, :, :], (B, M, na, 5, 2)).reshape(B, C, 2)
        t_box = jnp.concatenate(
            [m_xywhn[..., 0:2] - cell, m_xywhn[..., 2:4]], axis=-1
        )

        # ---- classification over kept candidates (:113-125)
        cur_flat = cur.reshape(B, C, 5 + nc)
        if nc >= 1:
            t_cls = jax.nn.one_hot(m_cls, nc) * (pos_t - neg_t) + neg_t
            bce = bce_with_logits(cur_flat[..., 5:], t_cls, cfg.cls_pos_weight)
            if cfg.use_focal_loss:
                bce = bce * focal_loss_factor(
                    cur_flat[..., 5:], t_cls, cfg.focal_loss_gamma,
                    cfg.focal_loss_alpha,
                )
            cls_loss += jnp.sum(jnp.mean(bce, axis=-1) * keepf) / jnp.maximum(
                n_pos, 1.0
            )

        # ---- regression (:127-132)
        pxy_s = jax.nn.sigmoid(cur_flat[..., 0:2]) * 2.0 - 0.5
        anc = jnp.broadcast_to(
            anchors_stage[None, None, :, None, :], (B, M, na, 5, 2)
        ).reshape(B, C, 2)
        pwh_s = (jax.nn.sigmoid(cur_flat[..., 2:4]) * 2.0) ** 2 * anc
        pred_box = xywh2xyxy(jnp.concatenate([pxy_s, pwh_s], axis=-1))
        iou_val = ciou(pred_box, xywh2xyxy(t_box))
        iou_loss += jnp.sum((1.0 - iou_val) * keepf) / jnp.maximum(n_pos, 1.0)

        # ---- objectness (:133-136). The reference scatters the detached
        # cof target into a dense grid; a TPU scatter serializes, so use the
        # exact sparse decomposition (see losses/yolov5.py):
        #   sum bce(logit, t_grid) = sum bce(logit, 0)
        #     + sum_winners [bce(l_j, v_j) - bce(l_j, 0)]
        # where the winner is the candidate the reference's plain index
        # assignment (loss/yolov7_loss.py:134) would write LAST: SimOTA's
        # boolean keep preserves the v5-expansion candidate order
        # (offset o outer, anchor a middle, box slot m inner), so the
        # lex-max (o, a, m) among kept same-cell candidates wins.
        if cfg.use_iou_as_tar_cof:
            cof_target = jnp.clip(jax.lax.stop_gradient(iou_val), 0.0) * keepf
        else:
            cof_target = keepf

        def obj_term(lg, t):
            b = bce_with_logits(lg, t, cfg.cof_pos_weight)
            if cfg.use_focal_loss:
                b = b * focal_loss_factor(
                    lg, t, cfg.focal_loss_gamma, cfg.focal_loss_alpha
                )
            return b

        obj_logits = pred[..., 4].astype(jnp.float32)
        full_sum = jnp.sum(obj_term(obj_logits, 0.0))

        idx_c = flat_idx.reshape(B, C)
        # our lattice flattens (m, a, o) with o fastest; the reference's
        # write order is (o, a, m) with o slowest — lex-max key wins
        j_ids = jnp.arange(C)
        o_k = j_ids % 5
        a_k = (j_ids // 5) % na
        m_k = j_ids // (5 * na)
        order_key = (o_k * na + a_k) * M + m_k
        same = idx_c[:, :, None] == idx_c[:, None, :]
        beats = (
            same
            & (keepf[:, :, None] > 0)
            & (order_key[:, None] > order_key[None, :])
        )
        winner = (keepf > 0) & ~jnp.any(beats, axis=1)  # (B, C)
        l_cand = cur_flat[..., 4]  # (B, C) gathered obj logits
        corr = jnp.where(
            winner, obj_term(l_cand, cof_target) - obj_term(l_cand, 0.0), 0.0
        )
        # NB: sum / num_targets, not mean (loss/yolov7_loss.py:151)
        cof_i = (
            (full_sum + jnp.sum(corr)) / jnp.maximum(n_pos, 1.0)
        ) * balances[i]
        new_balances.append(
            balances[i] * 0.9999 + 0.0001 / jax.lax.stop_gradient(cof_i)
        )
        cof_loss += cof_i

    new_balances = jnp.stack(new_balances)
    new_balances = new_balances / new_balances[1]

    iou_loss = iou_loss * cfg.iou_loss_scale * s
    cof_loss = cof_loss * cfg.cof_loss_scale * s * (1.0 if num_stages == 3 else 1.4)
    cls_loss = cls_loss * cfg.cls_loss_scale * s
    tot_loss = (iou_loss + cof_loss + cls_loss) * B

    loss_dict = {
        "tot_loss": tot_loss,
        "iou_loss": jax.lax.stop_gradient(iou_loss) * B,
        "cof_loss": jax.lax.stop_gradient(cof_loss) * B,
        "cls_loss": jax.lax.stop_gradient(cls_loss) * B,
        "tar_nums": jax.lax.stop_gradient(tar_num),
    }
    return loss_dict, new_balances
