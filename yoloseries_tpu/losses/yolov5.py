"""YOLOv5 loss — dense fixed-shape rebuild of loss/yolov5_loss.py.

The reference assigner (YOLOV5Loss.match, loss/yolov5_loss.py:142-214)
produces a variable-length list of positives via boolean indexing:
anchor-ratio filter -> cross-grid expansion to <=5 cells. Under jit that
becomes a dense (B, M, A, 5) candidate lattice with a validity mask:

* axis M: the -1-padded target slots from the collate,
* axis A: the 3 per-stage anchors (ratio-filtered, :159-170),
* axis 5: the {center, left, up, right, down} grid-expansion offsets
  (:173-198).

All loss terms are masked means, exactly reproducing the reference's
reductions; the objectness target grid is built with one scatter-max.

Stage balances [4, 1, 0.4] self-tune via an EMA on the running conf loss
(:123-127) — carried as explicit state (a (3,) array) through the train step
instead of Python-side mutation.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.boxes import xywh2xyxy, xyxy2xywhn
from ..ops.iou import ciou
from .common import bce_with_logits, focal_loss_factor

__all__ = ["YOLOv5LossConfig", "yolov5_loss", "initial_balances"]

# grid-expansion offsets, order matches loss/yolov5_loss.py:180
_OFFSETS = jnp.array(
    [[0.0, 0.0], [0.5, 0.0], [0.0, 0.5], [-0.5, 0.0], [0.0, -0.5]]
)


@dataclasses.dataclass(frozen=True)
class YOLOv5LossConfig:
    num_class: int
    input_size: tuple = (640, 640)  # (h, w)
    strides: tuple = (8, 16, 32)
    anchor_match_thr: float = 4.0
    iou_loss_scale: float = 0.05
    cls_loss_scale: float = 0.5
    cof_loss_scale: float = 1.0
    cls_pos_weight: float = 1.0
    cof_pos_weight: float = 1.0
    class_smooth_factor: float = 1.0
    use_focal_loss: bool = True
    focal_loss_gamma: float = 1.5
    focal_loss_alpha: float = 0.25
    # candidate-gather lowering: "flat" reshapes each stage map to
    # (B, H*W*A, 85) and take_along_axis's it — XLA materializes the
    # row-major reshape with large relayout copies (fwd + transposed bwd,
    # ~16 ms/step at b128@640 in the r5 trace); "cells" indexes the
    # (B, H, W, A, 85) view by (gy, gx) directly so only the gathered
    # (B, M, 5, A, 85) rows materialize. Identical values either way.
    gather_mode: str = "flat"


def initial_balances(num_stages: int = 3) -> jnp.ndarray:
    """Per-stage conf-loss balances (loss/yolov5_loss.py:28)."""
    if num_stages == 3:
        return jnp.array([4.0, 1.0, 0.4])
    return jnp.array([4.0, 1.0, 0.4, 0.1])


def yolov5_loss(
    stage_preds: Sequence[jnp.ndarray],
    targets: jnp.ndarray,
    anchors: jnp.ndarray,
    balances: jnp.ndarray,
    cfg: YOLOv5LossConfig,
):
    """Compute the YOLOv5 training loss.

    Args:
      stage_preds: per-stage NHWC maps (B, H, W, A*(5+nc)) at strides 8/16/32.
      targets: (B, M, 6) [xmin, ymin, xmax, ymax, cls, img_idx] in input-image
        pixels; padding rows are -1 (dataset/data_collater.py:40-42).
      anchors: (num_stages, A, 2) anchor wh in input pixels.
      balances: (num_stages,) conf-loss balance state.
      cfg: loss hyperparameters.

    Returns:
      (loss_dict, new_balances). ``loss_dict['tot_loss']`` is the
      scalar to differentiate; other entries are detached diagnostics.
    """
    num_stages = len(stage_preds)
    batch_size, num_boxes = targets.shape[0], targets.shape[1]
    nc = cfg.num_class
    na = anchors.shape[1]
    h_in, w_in = cfg.input_size

    valid = targets[..., 4] >= 0  # (B, M)
    t_xywhn = xyxy2xywhn(targets[..., :4], (w_in, h_in))  # (B, M, 4) normalized
    t_cls = jnp.clip(targets[..., 4].astype(jnp.int32), 0, nc - 1)

    thr = cfg.anchor_match_thr
    s = 3.0 / num_stages

    iou_loss = jnp.zeros((), jnp.float32)
    cls_loss = jnp.zeros((), jnp.float32)
    cof_loss = jnp.zeros((), jnp.float32)
    tar_num = jnp.zeros((), jnp.float32)
    new_balances = []

    for i, pred in enumerate(stage_preds):
        fm_h, fm_w = pred.shape[1], pred.shape[2]
        stride = w_in / fm_w
        anchors_stage = (anchors[i] / stride).astype(jnp.float32)  # (A, 2)
        # keep the model's compute dtype for the big map; only the gathered
        # candidate rows and the objectness slice are cast to f32 (avoids
        # materializing a full-size f32 copy of every stage map)
        pred = pred.reshape(batch_size, fm_h, fm_w, na, 5 + nc)

        scale = jnp.array([fm_w, fm_h, fm_w, fm_h], jnp.float32)
        t_stage = t_xywhn.astype(jnp.float32) * scale  # (B, M, 4)

        a = _assign_stage_thr(t_stage, valid, anchors_stage, fm_w, fm_h, thr)
        mask = a["mask"]  # (B, M, A, 5)
        maskf = mask.astype(jnp.float32)
        n_pos = jnp.sum(maskf)
        tar_num += n_pos

        # gather predictions at assigned cells: flat index over (H, W, A)
        flat_cell = (a["gy"] * fm_w + a["gx"]) * na  # (B, M, 5)
        flat_idx = (
            flat_cell[:, :, None, :] + jnp.arange(na)[None, None, :, None]
        )  # (B, M, A, 5)
        idx2 = flat_idx.reshape(batch_size, -1)  # (B, M*A*5)
        if cfg.gather_mode == "cells":
            bidx = jnp.arange(batch_size)[:, None, None]
            # (B, M, 5) cell coords -> (B, M, 5, A, 85) -> (B, M, A, 5, 85)
            cur = pred[bidx, a["gy"], a["gx"]].transpose(0, 1, 3, 2, 4)
        else:
            pred_flat = pred.reshape(batch_size, fm_h * fm_w * na, 5 + nc)
            cur = jnp.take_along_axis(pred_flat, idx2[..., None], axis=1)
            cur = cur.reshape(batch_size, num_boxes, na, 5, 5 + nc)
        cur = cur.astype(jnp.float32)

        # ---- classification (positives only, loss/yolov5_loss.py:81-93)
        if nc > 1:
            cls_logits = cur[..., 5:]  # (B, M, A, 5, nc)
            t_onehot = (
                jax.nn.one_hot(t_cls, nc, dtype=jnp.float32)[:, :, None, None, :]
                * cfg.class_smooth_factor
            )
            t_onehot = jnp.broadcast_to(t_onehot, cls_logits.shape)
            bce = bce_with_logits(cls_logits, t_onehot, cfg.cls_pos_weight)
            if cfg.use_focal_loss:
                bce = bce * focal_loss_factor(
                    cls_logits, t_onehot, cfg.focal_loss_gamma, cfg.focal_loss_alpha
                )
            cls_loss += jnp.sum(bce * maskf[..., None]) / jnp.maximum(
                n_pos * nc, 1.0
            )

        # ---- regression (CIoU on decoded offsets, loss/yolov5_loss.py:98-112)
        pxy = jax.nn.sigmoid(cur[..., 0:2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(cur[..., 2:4]) * 2.0) ** 2 * anchors_stage[
            None, None, :, None, :
        ]
        pred_box = xywh2xyxy(jnp.concatenate([pxy, pwh], axis=-1))
        t_box = jnp.concatenate(
            [
                a["t_off"][:, :, None, :, :] * jnp.ones((1, 1, na, 1, 1)),
                jnp.broadcast_to(
                    a["t_wh"][:, :, None, None, :], (batch_size, num_boxes, na, 5, 2)
                ),
            ],
            axis=-1,
        )
        t_box = xywh2xyxy(t_box)
        iou_val = ciou(pred_box, t_box)  # (B, M, A, 5)
        iou_loss += jnp.sum((1.0 - iou_val) * maskf) / jnp.maximum(n_pos, 1.0)

        # ---- objectness: the reference scatters detached clamped IoU into a
        # dense (B, H, W, A) target grid with plain index assignment
        # (loss/yolov5_loss.py:114) — duplicate cells resolve LAST-write-
        # wins in candidate order. An XLA TPU scatter over millions of grid
        # slots serializes and dominated the step-time profile, so use the
        # exact sparse decomposition
        #     sum bce(logit, t_grid) = sum bce(logit, 0)
        #       + sum_winners [bce(l_j, v_j) - bce(l_j, 0)]
        # where the "winner" of a cell is the candidate the reference would
        # have written last: match() flattens (A, B, M) anchor-major
        # (:159-170) then repeats 5x offset-major (:188-190), so within one
        # image the write order is offset o outer, anchor a middle, box
        # slot m inner — the lex-max (o, a, m) wins. The full-grid term
        # fuses into one elementwise pass over the prediction map; the
        # correction runs on the <=M*A*5 gathered candidates.
        iou_detached = jnp.clip(jax.lax.stop_gradient(iou_val), 0.0) * maskf

        def obj_term(lg, t):
            b = bce_with_logits(lg, t, cfg.cof_pos_weight)
            if cfg.use_focal_loss:
                b = b * focal_loss_factor(
                    lg, t, cfg.focal_loss_gamma, cfg.focal_loss_alpha
                )
            return b

        obj_logits = pred[..., 4].astype(jnp.float32)  # (B, H, W, A)
        full_sum = jnp.sum(obj_term(obj_logits, 0.0))

        vals = iou_detached.reshape(batch_size, -1)  # (B, J)
        livef = maskf.reshape(batch_size, -1)  # (B, J)
        # our lattice flattens (m, a, o) with o fastest; the reference's
        # write order is (o, a, m) with o slowest — lex-max key wins
        j_ids = jnp.arange(vals.shape[1])
        o_k = j_ids % 5
        a_k = (j_ids // 5) % na
        m_k = j_ids // (5 * na)
        order_key = (o_k * na + a_k) * num_boxes + m_k
        same = idx2[:, :, None] == idx2[:, None, :]  # (B, J, J)
        beats = (
            same
            & (livef[:, :, None] > 0)
            & (order_key[:, None] > order_key[None, :])
        )
        winner = (livef > 0) & ~jnp.any(beats, axis=1)  # (B, J)
        l_cand = cur[..., 4].reshape(batch_size, -1)  # gathered obj logits
        corr = jnp.where(
            winner, obj_term(l_cand, vals) - obj_term(l_cand, 0.0), 0.0
        )
        cof_i = (
            (full_sum + jnp.sum(corr))
            / (batch_size * fm_h * fm_w * na)
            * balances[i]
        )
        # balance EMA self-tuning (loss/yolov5_loss.py:124)
        new_balances.append(
            balances[i] * 0.9999 + 0.0001 / jax.lax.stop_gradient(cof_i)
        )
        cof_loss += cof_i

    new_balances = jnp.stack(new_balances)
    new_balances = new_balances / new_balances[1]  # (:127)

    iou_loss = iou_loss * cfg.iou_loss_scale * s
    cof_loss = cof_loss * cfg.cof_loss_scale * s * (1.0 if num_stages == 3 else 1.4)
    cls_loss = cls_loss * cfg.cls_loss_scale * s
    tot_loss = (iou_loss + cof_loss + cls_loss) * batch_size

    loss_dict = {
        "tot_loss": tot_loss,
        "iou_loss": jax.lax.stop_gradient(iou_loss) * batch_size,
        "cof_loss": jax.lax.stop_gradient(cof_loss) * batch_size,
        "cls_loss": jax.lax.stop_gradient(cls_loss) * batch_size,
        "tar_nums": jax.lax.stop_gradient(tar_num),
    }
    return loss_dict, new_balances


def _assign_stage_thr(t_stage, valid, anchors_stage, fm_w, fm_h, thr):
    """Dense positive-candidate lattice for one stage.

    Args:
      t_stage: (B, M, 4) targets in stage feature-map units (cx, cy, w, h).
      valid:   (B, M) bool — real (non-padding) targets.
      anchors_stage: (A, 2) anchor wh in feature-map units.
      fm_w, fm_h: static ints; thr: anchor-ratio threshold.

    Returns dict with:
      mask  (B, M, A, 5) bool — live candidate slots,
      gx/gy (B, M, 5) int32 — assigned grid cell (clamped),
      t_off (B, M, 5, 2) — xy offset targets relative to the cell,
      t_wh  (B, M, 2)    — wh targets in stage units.
    """
    t_wh = t_stage[..., 2:4]
    gxy = t_stage[..., 0:2]

    # anchor-ratio filter (loss/yolov5_loss.py:159-168)
    ratio = t_wh[:, :, None, :] / anchors_stage[None, None, :, :] + 1e-16
    ar_ok = jnp.max(jnp.maximum(ratio, 1.0 / ratio), axis=-1) < thr

    # grid-expansion masks (loss/yolov5_loss.py:178-186)
    gxy_inv = jnp.asarray([fm_w, fm_h], t_stage.dtype) - gxy
    near_lo = (gxy % 1.0 < 0.5) & (gxy > 1.0)
    near_hi = (gxy_inv % 1.0 < 0.5) & (gxy_inv > 1.0)
    ones = jnp.ones_like(near_lo[..., 0])
    grid_masks = jnp.stack(
        [ones, near_lo[..., 0], near_lo[..., 1], near_hi[..., 0], near_hi[..., 1]],
        axis=-1,
    )

    mask = valid[:, :, None, None] & ar_ok[:, :, :, None] & grid_masks[:, :, None, :]

    offs = _OFFSETS.astype(t_stage.dtype)
    cell = jnp.floor(gxy[:, :, None, :] - offs[None, None, :, :])
    t_off = gxy[:, :, None, :] - cell
    gx = jnp.clip(cell[..., 0].astype(jnp.int32), 0, fm_w - 1)
    gy = jnp.clip(cell[..., 1].astype(jnp.int32), 0, fm_h - 1)

    return {"mask": mask, "gx": gx, "gy": gy, "t_off": t_off, "t_wh": t_wh}
