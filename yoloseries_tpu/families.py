"""Detector-family adapters: model name -> (loss closure, decode closure).

The reference binds model/loss/evaluator triples by hand in six train_*.py
files (e.g. train_yolov5.py:31-39 vs train_yolox.py:31-32); here one table
maps a family to:

* ``make_loss(hyp, num_class, input_size)`` -> (loss_fn, initial_balances)
  where ``loss_fn(preds, targets, balances) -> (loss_dict, new_balances)``
  is the uniform interface consumed by `make_train_step`,
* ``make_decode(hyp, num_class, input_size)`` -> decode_fn mapping raw model
  outputs to the (B, N, 5+nc) pixel-space tensor the shared NMS postprocess
  consumes.

Families with no balance state (retinanet, fcos) return a 1-element dummy
balance vector that passes through unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np

from .losses.retinanet import RetinaNetLossConfig, retinanet_loss
from .losses.yolov5 import YOLOv5LossConfig, initial_balances, yolov5_loss
from .losses.yolox import YOLOXLossConfig, yolox_initial_balances, yolox_loss
from .ops.anchors import YOLOV5_ANCHORS, pyramid_anchors

__all__ = ["Family", "get_family", "family_of"]


@dataclasses.dataclass(frozen=True)
class Family:
    name: str
    make_loss: Callable  # (hyp, num_class, input_size) -> (loss_fn, balances0)
    make_decode: Callable  # (hyp, num_class, input_size) -> decode_fn
    # optional fused candidate selection: (hyp, num_class, input_size) ->
    # (eval_cfg -> select_fn), where select_fn(stage_preds) returns
    # (boxes_xyxy, scores, cls_ids) without a dense decoded tensor
    make_select: Callable | None = None
    # EvalConfig overrides for this family's postprocess quirks, as a
    # callable (hyp) -> dict of EvalConfig fields (applied via
    # `family.apply_eval_overrides(cfg, hyp)` wherever an Evaluator is
    # built): fcos reports sqrt scores + small-box filter, yolov7 filters
    # small boxes, retinanet emits merged boxes.
    eval_overrides: Callable | None = None

    def apply_eval_overrides(self, eval_cfg, hyp=None):
        if self.eval_overrides is None:
            return eval_cfg
        return dataclasses.replace(eval_cfg, **self.eval_overrides(hyp or {}))


def _yolov5_family():
    def make_loss(hyp, num_class, input_size):
        cfg = YOLOv5LossConfig(
            num_class=num_class,
            input_size=input_size,
            anchor_match_thr=hyp.get("anchor_match_thr", 4.0),
            iou_loss_scale=hyp.get("iou_loss_scale", 0.05),
            cls_loss_scale=hyp.get("cls_loss_scale", 0.5),
            cof_loss_scale=hyp.get("cof_loss_scale", 1.0),
            cls_pos_weight=hyp.get("cls_pos_weight", 1.0),
            cof_pos_weight=hyp.get("cof_pos_weight", 1.0),
            class_smooth_factor=hyp.get("class_smooth_factor", 1.0),
            use_focal_loss=hyp.get("use_focal_loss", True),
            focal_loss_gamma=hyp.get("focal_loss_gamma", 1.5),
            focal_loss_alpha=hyp.get("focal_loss_alpha", 0.25),
        )
        anchors = jnp.asarray(YOLOV5_ANCHORS)

        def loss_fn(preds, targets, balances):
            return yolov5_loss(preds, targets, anchors, balances, cfg)

        return loss_fn, initial_balances()

    def make_decode(hyp, num_class, input_size):
        from .evaluation.yolov5 import decode_yolov5

        anchors = jnp.asarray(YOLOV5_ANCHORS)
        return lambda preds: decode_yolov5(preds, anchors)

    def make_select(hyp, num_class, input_size):
        from .evaluation.yolov5 import decode_topk_yolov5

        anchors = jnp.asarray(YOLOV5_ANCHORS)

        def builder(eval_cfg):
            return lambda preds: decode_topk_yolov5(
                preds, anchors,
                k=eval_cfg.num_candidates,
                conf_threshold=eval_cfg.conf_threshold,
                cls_threshold=eval_cfg.cls_threshold,
            )

        return builder

    return Family("yolov5", make_loss, make_decode, make_select)


def _yolox_family():
    def make_loss(hyp, num_class, input_size):
        cfg = YOLOXLossConfig(
            num_class=num_class,
            input_size=input_size,
            topk=hyp.get("topk", 13),
            center_radius=hyp.get("center_radius", 3.0),
            iou_type=hyp.get("iou_type", "ciou"),
            use_l1=hyp.get("use_l1", True),
            iou_loss_scale=hyp.get("iou_loss_scale", 5.0),
            cls_loss_scale=hyp.get("cls_loss_scale", 1.0),
            cof_loss_scale=hyp.get("cof_loss_scale", 1.0),
            l1_loss_scale=hyp.get("l1_loss_scale", 1.0),
            class_smooth_factor=hyp.get("class_smooth_factor", 1.0),
            use_focal_loss=hyp.get("use_focal_loss", False),
        )

        def loss_fn(preds, targets, balances):
            return yolox_loss(preds, targets, balances, cfg)

        return loss_fn, yolox_initial_balances()

    def make_decode(hyp, num_class, input_size):
        from .evaluation.yolox import decode_yolox

        return lambda preds: decode_yolox(preds, num_class)

    def make_select(hyp, num_class, input_size):
        from .evaluation.yolox import decode_topk_yolox

        def builder(eval_cfg):
            return lambda preds: decode_topk_yolox(
                preds, num_class,
                k=eval_cfg.num_candidates,
                conf_threshold=eval_cfg.conf_threshold,
                cls_threshold=eval_cfg.cls_threshold,
            )

        return builder

    return Family("yolox", make_loss, make_decode, make_select)


def _retinanet_family(with_objectness: bool):
    def make_loss(hyp, num_class, input_size):
        cfg = RetinaNetLossConfig(
            num_class=num_class,
            pos_iou_thr=hyp.get("positive_iou_thr", 0.5),
            neg_iou_thr=hyp.get("negative_iou_thr", 0.4),
            alpha=hyp.get("alpha", 0.25),
            gamma=hyp.get("gamma", 2.0),
            delta_scales=tuple(hyp.get("tar_box_scale_factor", (0.1, 0.1, 0.2, 0.2))),
            l1_loss_scale=hyp.get("l1_loss_scale", 0.5),
            iou_loss_scale=hyp.get("iou_loss_scale", 0.5),
            cls_loss_scale=hyp.get("cls_loss_scale", 0.2),
            iou_type=hyp.get("iou_type", "ciou"),
            with_objectness=with_objectness,
            cof_loss_scale=hyp.get("cof_loss_scale", 1.0),
        )
        anchors = jnp.asarray(pyramid_anchors(np.asarray(input_size)))

        def loss_fn(preds, targets, balances):
            reg, cls = preds
            d = retinanet_loss(reg, cls, targets, anchors, cfg)
            return d, balances

        return loss_fn, jnp.ones((1,))

    def make_decode(hyp, num_class, input_size):
        from .evaluation.retinanet import decode_retinanet

        anchors = jnp.asarray(pyramid_anchors(np.asarray(input_size)))
        scales = tuple(hyp.get("tar_box_scale_factor", (0.1, 0.1, 0.2, 0.2)))
        clip = tuple(input_size)  # reference rounds+clamps decoded boxes
        return lambda preds: decode_retinanet(
            preds[0], preds[1], anchors, scales, clip_size=clip
        )

    def make_select(hyp, num_class, input_size):
        from .evaluation.retinanet import decode_topk_retinanet

        anchors = jnp.asarray(pyramid_anchors(np.asarray(input_size)))
        scales = tuple(hyp.get("tar_box_scale_factor", (0.1, 0.1, 0.2, 0.2)))

        def builder(eval_cfg):
            return lambda preds: decode_topk_retinanet(
                preds[0], preds[1], anchors,
                k=eval_cfg.num_candidates,
                conf_threshold=eval_cfg.conf_threshold,
                cls_threshold=eval_cfg.cls_threshold,
                delta_scales=scales,
                clip_size=tuple(input_size),
            )

        return builder

    name = "retinanet_experiment" if with_objectness else "retinanet"
    # trainer/eval_retinanet.py:344-351: merged boxes are written back
    return Family(name, make_loss, make_decode, make_select,
                  eval_overrides=lambda hyp: {"merge_write_boxes": True})


def _yolov7_family():
    def make_loss(hyp, num_class, input_size):
        from .losses.yolov7 import YOLOv7LossConfig, yolov7_loss

        cfg = YOLOv7LossConfig(
            num_class=num_class,
            input_size=input_size,
            anchor_match_thr=hyp.get("anchor_match_thr", 4.0),
            topk=hyp.get("topk", 10),
            iou_loss_scale=hyp.get("iou_loss_scale", 0.05),
            cls_loss_scale=hyp.get("cls_loss_scale", 0.5),
            cof_loss_scale=hyp.get("cof_loss_scale", 1.0),
            cls_pos_weight=hyp.get("cls_pos_weight", 1.0),
            cof_pos_weight=hyp.get("cof_pos_weight", 1.0),
            use_iou_as_tar_cof=hyp.get("use_iou_as_tar_cof", True),
            use_focal_loss=hyp.get("use_focal_loss", False),
        )
        anchors = jnp.asarray(YOLOV5_ANCHORS)

        def loss_fn(preds, targets, balances):
            return yolov7_loss(preds, targets, anchors, balances, cfg)

        return loss_fn, initial_balances()

    def make_decode(hyp, num_class, input_size):
        # v7 decode formulas are identical to v5 (sigmoid*2-0.5 / (2x)^2*anchor)
        from .evaluation.yolov5 import decode_yolov5

        anchors = jnp.asarray(YOLOV5_ANCHORS)
        return lambda preds: decode_yolov5(
            list(preds.values()) if isinstance(preds, dict) else preds, anchors
        )

    def make_select(hyp, num_class, input_size):
        from .evaluation.yolov5 import decode_topk_yolov5

        anchors = jnp.asarray(YOLOV5_ANCHORS)

        def builder(eval_cfg):
            return lambda preds: decode_topk_yolov5(
                list(preds.values()) if isinstance(preds, dict) else preds,
                anchors,
                k=eval_cfg.num_candidates,
                conf_threshold=eval_cfg.conf_threshold,
                cls_threshold=eval_cfg.cls_threshold,
                conf_gate=eval_cfg.conf_gate,
            )

        return builder

    # trainer/eval_yolov7.py:276: post-NMS small-box filter (v7 and fcos
    # are the only reference evaluators that apply remove_small_boxes);
    # :221,240: v7 gates candidates on obj*cls (not obj alone, and
    # non-strict) — conf_gate="v7"
    return Family(
        "yolov7", make_loss, make_decode, make_select,
        eval_overrides=lambda hyp: {
            "min_box_wh": float(hyp.get("min_prediction_box_wh", 0.0)),
            "conf_gate": "v7",
        },
    )


def _yolov8_family():
    def make_loss(hyp, num_class, input_size):
        from .losses.yolov8 import YOLOv8LossConfig, yolov8_loss

        cfg = YOLOv8LossConfig(
            num_class=num_class,
            input_size=input_size,
            reg=hyp.get("reg", 16),
            topk=hyp.get("topk", 13),
            alpha=hyp.get("alpha", 0.5),
            beta=hyp.get("beta", 6.0),
            iou_loss_scale=hyp.get("iou_loss_scale", 7.5),
            cls_loss_scale=hyp.get("cls_loss_scale", 0.5),
            dfl_loss_scale=hyp.get("dfl_loss_scale", 1.5),
            cls_pos_weight=hyp.get("cls_pos_weight", 1.0),
            use_focal_factor=hyp.get("use_focal_loss", True),
            focal_loss_gamma=hyp.get("focal_loss_gamma", 1.5),
            focal_loss_alpha=hyp.get("focal_loss_alpha", 0.25),
        )

        def loss_fn(preds, targets, balances):
            return yolov8_loss(preds, targets, balances, cfg)

        return loss_fn, jnp.ones((1,))

    def make_decode(hyp, num_class, input_size):
        from .evaluation.yolov8 import decode_yolov8

        reg = hyp.get("reg", 16)
        return lambda preds: decode_yolov8(preds, num_class, input_size, reg=reg)

    def make_select(hyp, num_class, input_size):
        from .evaluation.yolov8 import decode_topk_yolov8

        reg = hyp.get("reg", 16)

        def builder(eval_cfg):
            return lambda preds: decode_topk_yolov8(
                preds, num_class, input_size,
                k=eval_cfg.num_candidates,
                conf_threshold=eval_cfg.conf_threshold,
                cls_threshold=eval_cfg.cls_threshold,
                reg=reg,
            )

        return builder

    return Family("yolov8", make_loss, make_decode, make_select)


def _fcos_family():
    def make_loss(hyp, num_class, input_size):
        from .losses.fcos import FCOSLossConfig, fcos_loss

        def build(num_levels):
            return FCOSLossConfig(
                num_class=num_class,
                input_size=input_size,
                center_sampling_radius=hyp.get("center_sampling_radius", 1.5),
                do_center_sampling=hyp.get("do_center_sampling", True),
                iou_type=hyp.get("iou_type", "giou"),
                cls_loss_weight=hyp.get("cls_loss_weight", 1.0),
                reg_loss_weight=hyp.get("reg_loss_weight", 1.0),
                ctr_loss_weight=hyp.get("ctr_loss_weight", 1.0),
                cls_pos_weight=hyp.get("cls_pos_weight", 1.0),
                ctr_pos_weight=hyp.get("ctr_pos_weight", 1.0),
                class_smooth_factor=hyp.get("class_smooth_factor", 0.0),
                eps=hyp.get("eps", 1e-6),
            )

        def loss_fn(preds, targets, balances):
            cls_fms, reg_fms, ctr_fms = preds
            d = fcos_loss(cls_fms, reg_fms, ctr_fms, targets, build(len(cls_fms)))
            return d, balances

        return loss_fn, jnp.ones((1,))

    def make_decode(hyp, num_class, input_size):
        from .evaluation.fcos import decode_fcos

        return lambda preds: decode_fcos(preds[0], preds[1], preds[2], input_size)

    def make_select(hyp, num_class, input_size):
        from .evaluation.fcos import decode_topk_fcos

        def builder(eval_cfg):
            return lambda preds: decode_topk_fcos(
                preds[0], preds[1], preds[2], input_size,
                k=eval_cfg.num_candidates,
                conf_threshold=eval_cfg.conf_threshold,
                cls_threshold=eval_cfg.cls_threshold,
            )

        return builder

    # trainer/eval_fcos.py:279: reported conf is sqrt(ctr * cls);
    # :302: post-NMS small-box filter (w, h must EXCEED the threshold)
    return Family(
        "fcos", make_loss, make_decode, make_select,
        eval_overrides=lambda hyp: {
            "conf_sqrt": True,
            "min_box_wh": float(hyp.get("min_prediction_box_wh", 0.0)),
            # fcos's merge gate is `1 < n <= 300` (eval_fcos.py:289)
            "merge_gate_max": 301,
        },
    )


_FAMILIES: dict[str, Family] = {}


def _register_families():
    _FAMILIES["yolov5"] = _yolov5_family()
    _FAMILIES["yolox"] = _yolox_family()
    _FAMILIES["yolov7"] = _yolov7_family()
    _FAMILIES["yolov8"] = _yolov8_family()
    _FAMILIES["fcos"] = _fcos_family()
    _FAMILIES["retinanet"] = _retinanet_family(False)
    _FAMILIES["retinanet_experiment"] = _retinanet_family(True)


_register_families()


def family_of(model_name: str, default: str | None = None) -> str:
    """Map a registry model name to its family key (longest prefix wins).

    Unknown names raise (a typo'd --model must not silently train with the
    v5 loss); pass ``default='yolov5'`` explicitly for custom models that
    emit v5-compatible per-stage (B, H, W, A*(5+nc)) maps at strides
    8/16/32.
    """
    for key in sorted(_FAMILIES, key=len, reverse=True):
        if model_name.startswith(key):
            return key
    if default is not None:
        return default
    raise KeyError(
        f"unknown model family for {model_name!r}; known prefixes: "
        f"{sorted(_FAMILIES)} (pass default='yolov5' for custom "
        "v5-head-compatible models)"
    )


def get_family(model_name: str, default: str | None = None) -> Family:
    return _FAMILIES[family_of(model_name, default)]
