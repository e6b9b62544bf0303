"""RetinaNet loss — dense max-IoU anchor assignment + focal + smooth-L1.

Rebuild of loss/retinanet_loss.py (and the "experiment" variant
loss/retinanet_loss_experiment.py which adds an objectness BCE):

* per anchor: best-IoU gt; positive >= pos_iou_thr (0.5), negative <
  neg_iou_thr (0.4), in-between ignored (:96-108),
* alpha/gamma focal BCE on class logits, normalized by positive count
  (:111-127),
* smooth-L1 (beta 1/9) on (dx, dy, dw, dh) / scale_factors deltas (:143-188),
  optional IoU loss in delta space (:191-239).

The reference loops over images with boolean indexing (:76-170); here the
whole batch is one dense (B, A, ...) computation — the per-image iou matrix
against the padded (M) gt slots is built under lax.map chunks to bound
memory at 9-anchor pyramid scale (~77k anchors at 640px).

Quirk NOT replicated: the reference computes the focal weight from the raw
logits clamped to [1e-3, 1-1e-3] as if they were probabilities
(:110, :115-117); we use sigmoid(logits), the standard focal-loss form.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.boxes import xyxy2xywh
from .common import bce_with_logits

__all__ = ["RetinaNetLossConfig", "retinanet_loss"]


@dataclasses.dataclass(frozen=True)
class RetinaNetLossConfig:
    num_class: int
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    alpha: float = 0.25
    gamma: float = 2.0
    delta_scales: tuple = (0.1, 0.1, 0.2, 0.2)
    l1_loss_scale: float = 0.5
    iou_loss_scale: float = 0.5
    cls_loss_scale: float = 0.2
    iou_type: str = "ciou"
    with_objectness: bool = False  # experiment variant
    cof_loss_scale: float = 1.0
    image_chunk: int = 4


def _anchor_gt_iou(anchors, gt_boxes):
    """(A, 4) x (M, 4) -> (A, M) IoU, eps 1e-8 (loss/retinanet_loss.py:30-57)."""
    area_a = (anchors[:, 2] - anchors[:, 0]) * (anchors[:, 3] - anchors[:, 1])
    area_g = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    lt = jnp.maximum(anchors[:, None, 0:2], gt_boxes[None, :, 0:2])
    rb = jnp.minimum(anchors[:, None, 2:4], gt_boxes[None, :, 2:4])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_g[None, :] - inter + 1e-8
    return inter / union


def _smooth_l1(pred, target, beta=1.0 / 9.0):
    """Smooth-L1 with the reference's beta (loss/retinanet_loss.py:180-188)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff <= beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)


def _delta_iou_loss(pred, target, iou_type, eps=1e-8):
    """IoU family directly in delta (xywh) space (loss/retinanet_loss.py:191-239)."""
    import math

    p_min = pred[..., 0:2] - pred[..., 2:4] / 2
    p_max = pred[..., 0:2] + pred[..., 2:4] / 2
    t_min = target[..., 0:2] - target[..., 2:4] / 2
    t_max = target[..., 0:2] + target[..., 2:4] / 2
    i_min = jnp.maximum(p_min, t_min)
    i_max = jnp.minimum(p_max, t_max)
    mask = jnp.prod((i_min < i_max).astype(pred.dtype), axis=-1)
    area_p = jnp.prod(pred[..., 2:4], axis=-1)
    area_t = jnp.prod(target[..., 2:4], axis=-1)
    inter = jnp.prod(i_max - i_min, axis=-1) * mask
    union = area_p + area_t - inter
    iou = inter / (union + eps)
    if iou_type == "iou":
        return 1.0 - iou**2
    cw = jnp.maximum(p_max[..., 0], t_max[..., 0]) - jnp.minimum(p_min[..., 0], t_min[..., 0])
    ch = jnp.maximum(p_max[..., 1], t_max[..., 1]) - jnp.minimum(p_min[..., 1], t_min[..., 1])
    if iou_type == "giou":
        convex = cw * ch
        giou = iou - (convex - union) / jnp.clip(convex, eps)
        return 1.0 - jnp.clip(giou, -1.0, 1.0)
    c_diag = cw**2 + ch**2 + eps
    dist = (pred[..., 0] - target[..., 0]) ** 2 + (pred[..., 1] - target[..., 1]) ** 2
    # reference quirk (replicated): `h1, w1 = preds_box[:, [2, 3]].T`
    # (loss/retinanet_loss.py:225-226) swaps the names, so the aspect term is
    # atan(h/w) not atan(w/h); the denominators are NOT clamped — in delta
    # space w/h can be any sign and the quirk changes the value.
    v = (4.0 / math.pi**2) * (
        jnp.arctan(target[..., 3] / target[..., 2])
        - jnp.arctan(pred[..., 3] / pred[..., 2])
    ) ** 2
    alpha = jax.lax.stop_gradient(v / (1.0 - iou + v + eps))
    return 1.0 - (iou - dist / c_diag - v * alpha)


def retinanet_loss(regression, classification, targets, anchors,
                   cfg: RetinaNetLossConfig):
    """Args:
      regression: (B, A, 4) deltas — or (B, A, 5) with objectness when
        cfg.with_objectness (experiment variant).
      classification: (B, A, nc) logits.
      targets: (B, M, 6) [x1, y1, x2, y2, cls, img_idx], -1 padded.
      anchors: (A, 4) xyxy.
    """
    nc = cfg.num_class
    B = targets.shape[0]
    anchors = anchors.astype(jnp.float32)
    anchor_xywh = xyxy2xywh(anchors)

    gt_valid = targets[..., 4] >= 0  # (B, M)
    gt_boxes = targets[..., 0:4].astype(jnp.float32)
    gt_cls = jnp.clip(targets[..., 4].astype(jnp.int32), 0, nc - 1)

    def assign_one(args):
        boxes, valid = args  # (M, 4), (M,)
        iou = _anchor_gt_iou(anchors, boxes)  # (A, M)
        iou = jnp.where(valid[None, :], iou, -1.0)
        iou_max = jnp.max(iou, axis=-1)
        iou_arg = jnp.argmax(iou, axis=-1)
        return iou_max, iou_arg.astype(jnp.int32)

    iou_max, iou_arg = jax.lax.map(
        assign_one, (gt_boxes, gt_valid), batch_size=min(cfg.image_chunk, B)
    )  # (B, A) each

    has_gt = jnp.any(gt_valid, axis=-1)  # (B,)
    positive = (iou_max >= cfg.pos_iou_thr) & has_gt[:, None]
    negative = (iou_max < cfg.neg_iou_thr) | ~has_gt[:, None]
    num_pos = jnp.sum(positive.astype(jnp.float32), axis=-1)  # (B,)

    # matched gt per anchor
    b_idx = jnp.arange(B)[:, None]
    m_cls = gt_cls[b_idx, iou_arg]  # (B, A)
    m_box = gt_boxes[b_idx, iou_arg]  # (B, A, 4)

    # ---- classification: focal BCE, ignore between thresholds
    t_cls = jnp.where(
        positive[..., None],
        jax.nn.one_hot(m_cls, nc),
        jnp.zeros((1, 1, nc)),
    )
    care = positive | negative  # (B, A)
    prob = jax.nn.sigmoid(classification.astype(jnp.float32))
    alpha_factor = jnp.where(t_cls > 0, cfg.alpha, 1.0 - cfg.alpha)
    focal = jnp.where(t_cls > 0, 1.0 - prob, prob) ** cfg.gamma * alpha_factor
    bce = bce_with_logits(classification.astype(jnp.float32), t_cls) * focal
    bce = bce * care[..., None]
    cls_loss_per_img = jnp.sum(bce, axis=(1, 2)) / jnp.maximum(num_pos, 1.0)
    cls_loss = jnp.mean(cls_loss_per_img)

    # ---- regression: smooth-L1 (+ optional IoU) on scaled deltas
    gt_xywh = xyxy2xywh(m_box)
    gw = jnp.clip(gt_xywh[..., 2], 1.0)
    gh = jnp.clip(gt_xywh[..., 3], 1.0)
    aw = anchor_xywh[None, :, 2]
    ah = anchor_xywh[None, :, 3]
    deltas = jnp.stack(
        [
            (gt_xywh[..., 0] - anchor_xywh[None, :, 0]) / aw,
            (gt_xywh[..., 1] - anchor_xywh[None, :, 1]) / ah,
            jnp.log(gw / aw),
            jnp.log(gh / ah),
        ],
        axis=-1,
    ) / jnp.asarray(cfg.delta_scales)

    reg = regression.astype(jnp.float32)
    reg_box = reg[..., 0:4]
    posf = positive.astype(jnp.float32)
    l1 = jnp.mean(_smooth_l1(reg_box, deltas), axis=-1)  # (B, A)
    l1_per_img = jnp.sum(l1 * posf, axis=-1) / jnp.maximum(num_pos, 1.0)
    l1_loss = jnp.mean(l1_per_img)

    if cfg.iou_loss_scale > 0:
        iou_l = _delta_iou_loss(reg_box, deltas, cfg.iou_type)
        iou_per_img = jnp.sum(iou_l * posf, axis=-1) / jnp.maximum(num_pos, 1.0)
        iou_loss = jnp.mean(iou_per_img)
    else:
        iou_loss = jnp.zeros(())

    tot = (
        l1_loss * cfg.l1_loss_scale
        + iou_loss * cfg.iou_loss_scale
        + cls_loss * cfg.cls_loss_scale
    )

    loss_dict = {
        "l1_loss": jax.lax.stop_gradient(l1_loss) * cfg.l1_loss_scale,
        "iou_loss": jax.lax.stop_gradient(iou_loss) * cfg.iou_loss_scale,
        "cls_loss": jax.lax.stop_gradient(cls_loss) * cfg.cls_loss_scale,
        "tar_nums": jnp.sum(posf),
    }

    if cfg.with_objectness:
        # experiment variant: BCE on the 5th regression channel, target 1 for
        # positives / 0 for negatives, ignored in between
        cof_logits = reg[..., 4]
        t_cof = posf
        bce_cof = bce_with_logits(cof_logits, t_cof) * care.astype(jnp.float32)
        cof_per_img = jnp.sum(bce_cof, axis=-1) / jnp.maximum(num_pos, 1.0)
        cof_loss = jnp.mean(cof_per_img) * cfg.cof_loss_scale
        tot = tot + cof_loss
        loss_dict["cof_loss"] = jax.lax.stop_gradient(cof_loss)

    loss_dict["tot_loss"] = tot
    return loss_dict
