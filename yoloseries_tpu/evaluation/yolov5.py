"""YOLOv5 evaluator: on-device decode + TTA + NMS, fixed shapes.

Rebuilds trainer/eval_yolov5.py TPU-first. The reference decodes on GPU and
ships the full prediction tensor to CPU for numba NMS (:261-317); here the
whole path — model forward, sigmoid decode (:181-209), optional test-time
augmentation (:152-179), confidence gating and greedy NMS — is one jitted
function producing a static (B, max_keep, 6) tensor. Only the final slots
travel to host, where `unletterbox` maps them back to original image coords.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.anchors import make_grid
from ..ops.nms import postprocess_detections

__all__ = [
    "decode_yolov5",
    "decode_topk_yolov5",
    "EvalConfig",
    "Evaluator",
    "scale_and_pad",
]


def decode_yolov5(stage_preds, anchors, strides=(8, 16, 32),
                  dtype=jnp.float32):
    """Raw NHWC maps -> (B, N, 5+nc) [cx, cy, w, h, obj, cls...] in pixels.

    Matches YOLOV5Evaluator.do_inference (trainer/eval_yolov5.py:181-209):
    xy = (2*sigmoid - 0.5 + grid) * stride, wh = (2*sigmoid)^2 * anchor.

    ``dtype=bfloat16`` halves the decode bandwidth (the (B, N, 85) tensor
    dominates HBM traffic at serving batch sizes) at <1 px box error —
    use for throughput serving; keep f32 for mAP evaluation.
    """
    outs = []
    num_anchor = anchors.shape[1]
    for pred, stride in zip(stage_preds, strides):
        b, h, w, c = pred.shape
        no = c // num_anchor
        p = jax.nn.sigmoid(pred.astype(dtype).reshape(b, h, w, num_anchor, no))
        grid = jnp.asarray(make_grid(h, w)).astype(dtype)  # (h, w, 2)
        anchor = anchors[strides.index(stride) if isinstance(strides, list) else
                         list(strides).index(stride)].astype(dtype)
        xy = (p[..., 0:2] * 2.0 - 0.5 + grid[None, :, :, None, :]) * stride
        wh = (p[..., 2:4] * 2.0) ** 2 * anchor[None, None, None, :, :]
        out = jnp.concatenate([xy, wh, p[..., 4:]], axis=-1)
        outs.append(out.reshape(b, h * w * num_anchor, no))
    return jnp.concatenate(outs, axis=1)


def decode_topk_yolov5(stage_preds, anchors, k, conf_threshold,
                       cls_threshold, strides=(8, 16, 32),
                       dtype=jnp.float32, conf_gate="v5", select="auto"):
    """Fused candidate selection + sparse decode for the serving path.

    :func:`decode_yolov5` materializes the dense (B, N, 5+nc) decoded tensor
    (~1 GB at batch 256) which the NMS front half then re-reads just to pick
    the top-K candidates. Here the score `sigmoid(obj) * sigmoid(max cls)` is
    computed directly on the raw NHWC maps (one HBM pass, nothing dense
    written), top-K indices are taken per stage, and only those K rows are
    gathered and decoded with the yolov5 box transform
    (trainer/eval_yolov5.py:181-209). Per-stage top-K then a global top-K
    over the 3K union selects exactly the same candidate set as a global
    top-K over the dense tensor.

    ``select`` picks the selection engine (identical outputs, incl. tie
    order — both resolve equal scores to the lower flat index):
    * "topk": per-stage lax.top_k + sparse row gathers — wins at small K
      (serving, K<=1024) where the gather volume is low,
    * "sort": decode boxes/cls DENSELY (6 thin planes, elementwise — no
      gather at all) and run ONE variadic stable sort over the score
      plane, slicing the first K. At the 4096-candidate eval protocol the
      row + decode-const gathers cost ~60 ms/batch at B=256 on v5e while
      the sort costs ~19 ms — gathers at scattered indices are the
      pathological op on TPU, a stable bitonic sort is not,
    * "auto": "sort" when k > 1024 else "topk" (the measured crossover).

    Returns:
      boxes: (B, K, 4) xyxy in input pixels,
      scores: (B, K) conf = obj * cls_conf, 0 for gated/padded slots,
      cls_ids: (B, K) float class ids.
    """
    from .select import topk_gather

    if select == "auto":
        select = "sort" if k > 1024 else "topk"
    if select == "sort":
        num_anchor = anchors.shape[1]
        plane_parts = {n: [] for n in ("score", "x1", "y1", "x2", "y2", "cls")}
        for si, (pred, stride) in enumerate(zip(stage_preds, strides)):
            b, h, w, c = pred.shape
            no = c // num_anchor
            p = jax.nn.sigmoid(
                pred.astype(dtype).reshape(b, h, w, num_anchor, no)
            )
            obj = p[..., 4]
            cls_conf_a = jnp.max(p[..., 5:], axis=-1)
            cls_id = jnp.argmax(p[..., 5:], axis=-1)
            score = obj * cls_conf_a
            if conf_gate == "v7":
                valid = (score >= conf_threshold) & (score >= cls_threshold)
            else:
                valid = (obj >= conf_threshold) & (score > cls_threshold)
            score = jnp.where(valid, score, 0.0)
            grid = jnp.asarray(make_grid(h, w)).astype(dtype)
            anchor = anchors[si].astype(dtype)
            xy = (p[..., 0:2] * 2.0 - 0.5 + grid[None, :, :, None, :]) * stride
            half = ((p[..., 2:4] * 2.0) ** 2
                    * anchor[None, None, None, :, :]) * 0.5
            lo = (xy - half).astype(jnp.float32)
            hi = (xy + half).astype(jnp.float32)
            flat = lambda x: x.reshape(b, h * w * num_anchor)
            plane_parts["score"].append(flat(score.astype(jnp.float32)))
            plane_parts["x1"].append(flat(lo[..., 0]))
            plane_parts["y1"].append(flat(lo[..., 1]))
            plane_parts["x2"].append(flat(hi[..., 0]))
            plane_parts["y2"].append(flat(hi[..., 1]))
            plane_parts["cls"].append(flat(cls_id.astype(jnp.float32)))
        planes = {n: jnp.concatenate(v, axis=1) for n, v in plane_parts.items()}
        ordered = jax.lax.sort(
            [-planes["score"], planes["x1"], planes["y1"], planes["x2"],
             planes["y2"], planes["cls"]],
            dimension=-1, num_keys=1, is_stable=True,
        )
        kk = min(k, planes["score"].shape[1])
        score_f = -ordered[0][..., :kk]
        boxes = jnp.stack([o[..., :kk] for o in ordered[1:5]], axis=-1)
        cls_f = ordered[5][..., :kk]
        if kk < k:  # pad to the static K contract
            padw = ((0, 0), (0, k - kk))
            score_f = jnp.pad(score_f, padw)
            cls_f = jnp.pad(cls_f, padw)
            boxes = jnp.pad(boxes, ((0, 0), (0, k - kk), (0, 0)))
        return boxes, score_f, cls_f

    num_anchor = anchors.shape[1]
    anchors_np = np.asarray(anchors)

    # pass 1 — one read of the raw maps, writing only the small score
    # plane (B, Ns; ~25 MB at batch 256 vs ~1 GB dense). Class ids are NOT
    # computed here: a full-plane argmax is a second pass over the maps;
    # instead the winning rows are re-read below and argmax runs on (B, K)
    stage_scores, stage_rows = [], []
    consts = []
    for si, (pred, stride) in enumerate(zip(stage_preds, strides)):
        b, h, w, c = pred.shape
        no = c // num_anchor
        ns = h * w * num_anchor
        p = pred.astype(dtype).reshape(b, ns, no)
        obj = jax.nn.sigmoid(p[..., 4])
        cls_logit = p[..., 5:]
        cls_conf = obj * jax.nn.sigmoid(jnp.max(cls_logit, axis=-1))
        if conf_gate == "v7":
            # v7 gates on the product, non-strict (eval_yolov7.py:221,240)
            valid = (cls_conf >= conf_threshold) & (cls_conf >= cls_threshold)
        else:
            valid = (obj >= conf_threshold) & (cls_conf > cls_threshold)
        stage_scores.append(jnp.where(valid, cls_conf, 0.0).astype(jnp.float32))
        stage_rows.append(p)

        # per-index decode constants: grid x/y, anchor w/h and stride for
        # the flattened ((y*W + x)*A + a) layout — trace-time numpy, ~500 KB
        ii = np.arange(ns)
        cell, a = ii // num_anchor, ii % num_anchor
        consts.append(np.stack(
            [
                (cell % w).astype(np.float32),
                (cell // w).astype(np.float32),
                anchors_np[si][a, 0],
                anchors_np[si][a, 1],
                np.full(ns, float(stride), np.float32),
            ],
            axis=1,
        ))

    # pass 2 — ONE global top-k over the concatenated score planes (index
    # order identical to the dense decode_yolov5 concat), then sparse
    # masked gathers of just the K winning rows from each stage
    score_f, idx_f, (rows,) = topk_gather(stage_scores, k, [stage_rows])

    const_all = jnp.asarray(np.concatenate(consts, axis=0), jnp.float32)
    ck = jnp.take(const_all, idx_f, axis=0)  # (B, K, 5)

    cls_f = jnp.argmax(rows[..., 5:], axis=-1)
    sig = jax.nn.sigmoid(rows[..., 0:4])
    stride_f = ck[..., 4:5]
    xy = (sig[..., 0:2] * 2.0 - 0.5 + ck[..., 0:2]) * stride_f
    half = ((sig[..., 2:4] * 2.0) ** 2 * ck[..., 2:4]) * 0.5
    boxes = jnp.concatenate([xy - half, xy + half], axis=-1).astype(jnp.float32)
    return boxes, score_f, cls_f.astype(jnp.float32)


def scale_and_pad(img, scale_factor, pad_value=0.447):
    """Bilinear downscale then zero-pad back to /32-aligned size
    (trainer/eval_yolov5.py:211-227). img: (B, H, W, 3) float."""
    if scale_factor == 1.0:
        return img
    b, h, w, c = img.shape
    nh, nw = int(scale_factor * h), int(scale_factor * w)
    # antialias=False: the reference's F.interpolate(bilinear,
    # align_corners=False) does NOT antialias; jax.image.resize does by
    # default, which materially changes downscaled TTA branches
    out = jax.image.resize(img, (b, nh, nw, c), method="bilinear",
                           antialias=False)
    oh = int(np.ceil(h / 32) * 32)
    ow = int(np.ceil(w / 32) * 32)
    return jnp.pad(
        out,
        ((0, 0), (0, oh - nh), (0, ow - nw), (0, 0)),
        constant_values=pad_value,
    )


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    conf_threshold: float = 0.001
    cls_threshold: float = 0.001
    iou_threshold: float = 0.65
    # pre-NMS candidate cap. 4096 (not 2048) so the count-based merge gate
    # (`1 < n < 3000`, ops/nms.py) is exact and the capped protocol path
    # matches the uncapped oracle (tests/test_candidate_cap.py certifies
    # |delta mAP| ~ 0 on detection-dense images)
    num_candidates: int = 4096
    max_keep: int = 300
    class_aware: bool = True  # the reference's (misnamed) `agnostic: true`
    merge_boxes: bool = True  # `postprocess_bbox`
    use_tta: bool = False
    tta_scales: tuple = (1.0, 0.83, 0.67)
    # flip axis per TTA branch: None / 1 (H, flip-up-down) / 2 (W, flip-lr)
    tta_flips: tuple = (None, 1, 2)
    # None = auto: Pallas greedy-NMS kernel on TPU, XLA scan elsewhere
    use_pallas_nms: bool | None = None
    multi_label: bool = False  # the reference's `mutil_label`
    nms_mode: str = "greedy"  # 'greedy' | 'soft_linear' | 'soft_exp'
    # Weighted Boxes Fusion over the independent TTA branches instead of NMS
    # on the merged set (`wfb: true`, trainer/eval_yolov5.py:37-39, 44-92)
    use_wbf: bool = False
    wbf_iou_threshold: float = 0.5
    wbf_weights: tuple | None = None
    # family quirks (see Family.eval_overrides):
    # fcos reports conf = sqrt(ctr * cls) (trainer/eval_fcos.py:279)
    conf_sqrt: bool = False
    # retinanet writes the IoU-weighted merged boxes into the output rows
    # instead of discarding them (trainer/eval_retinanet.py:344-351)
    merge_write_boxes: bool = False
    # v7/fcos post-NMS small-box filter (`min_prediction_box_wh`,
    # trainer/eval_yolov7.py:276, eval_fcos.py:302): keep only detections
    # whose width AND height strictly exceed this. None = off.
    min_box_wh: float | None = None
    # the reference gates the merge refinement on the pre-NMS candidate
    # count `1 < n < 3000` (eval_yolov5.py:307; fcos `<= 300` -> 301)
    merge_gate_max: int = 3000
    # candidate confidence gate: "v5" = obj >= conf then obj*cls > cls_thr
    # (eval_yolov5.py:266,285 — also yolox/v8/retinanet/fcos); "v7" =
    # obj*cls >= conf then obj*cls >= cls_thr (eval_yolov7.py:221,240)
    conf_gate: str = "v5"


class Evaluator:
    """Wraps (apply_fn, decode_fn) into a jitted image->detections pipeline.

    apply_fn(variables, img, train=False) -> stage_preds.
    decode_fn(stage_preds) -> (B, N, 5+nc) pixel-space predictions.
    """

    def __init__(self, apply_fn: Callable, decode_fn: Callable, cfg: EvalConfig,
                 select_fn: Callable | None = None):
        """``select_fn(stage_preds) -> (boxes_xyxy, scores, cls_ids)`` is the
        fused candidate-selection path (e.g. a partial of
        :func:`decode_topk_yolov5`): when given and ``multi_label`` is off,
        the evaluator skips the dense decoded tensor entirely. Candidate
        sets are identical to the dense path (see tests/test_decode_topk.py).
        """
        self.apply_fn = apply_fn
        self.decode_fn = decode_fn
        self.cfg = cfg
        self.select_fn = select_fn if not cfg.multi_label else None
        self._jitted = jax.jit(self._run)
        self._jitted_branches = jax.jit(self._run_tta_branches)

    def _infer(self, variables, img):
        preds = self.apply_fn(variables, img, train=False)
        return self.decode_fn(preds)

    def _infer_tta(self, variables, img):
        """3x scale/flip inference, merged (trainer/eval_yolov5.py:152-179)."""
        b, img_h, img_w, _ = img.shape
        merged = []
        for s, f in zip(self.cfg.tta_scales, self.cfg.tta_flips):
            x = jnp.flip(img, axis=f) if f is not None else img
            x = scale_and_pad(x, s)
            p = self._infer(variables, x)
            p = p.at[..., 0:4].set(p[..., 0:4] / s)
            if f == 1:  # flipped along H -> mirror y
                p = p.at[..., 1].set(img_h - p[..., 1])
            if f == 2:  # flipped along W -> mirror x
                p = p.at[..., 0].set(img_w - p[..., 0])
            merged.append(p)
        return jnp.concatenate(merged, axis=1)

    def _post(self, preds):
        use_pallas = self.cfg.use_pallas_nms
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        out = postprocess_detections(
            preds,
            conf_threshold=self.cfg.conf_threshold,
            cls_threshold=self.cfg.cls_threshold,
            iou_threshold=self.cfg.iou_threshold,
            num_candidates=self.cfg.num_candidates,
            max_keep=self.cfg.max_keep,
            class_aware=self.cfg.class_aware,
            merge_boxes=self.cfg.merge_boxes,
            use_pallas=use_pallas,
            multi_label=self.cfg.multi_label,
            nms_mode=self.cfg.nms_mode,
            merge_write_boxes=self.cfg.merge_write_boxes,
            merge_gate_max=self.cfg.merge_gate_max,
            conf_gate=self.cfg.conf_gate,
        )
        return self._finalize(out)

    def _finalize(self, out):
        if self.cfg.min_box_wh is not None:
            m = self.cfg.min_box_wh
            big = ((out[..., 2] - out[..., 0]) > m) & (
                (out[..., 3] - out[..., 1]) > m
            )
            out = out.at[..., 4].set(jnp.where(big, out[..., 4], 0.0))
        if self.cfg.conf_sqrt:
            out = out.at[..., 4].set(jnp.sqrt(out[..., 4]))
        return out

    # ---- fused candidate path (select_fn): no dense decoded tensor ----
    def _select(self, variables, img):
        preds = self.apply_fn(variables, img, train=False)
        return self.select_fn(preds)

    @staticmethod
    def _adjust_boxes(boxes, s, f, img_h, img_w):
        """Undo a TTA branch's scale/flip on xyxy candidate boxes (the dense
        path adjusts centers pre-corner-conversion; corners swap on mirror)."""
        boxes = boxes / s if s != 1.0 else boxes
        x0, y0, x1, y1 = (boxes[..., i] for i in range(4))
        if f == 1:  # flipped along H -> mirror y, corners swap
            y0, y1 = img_h - y1, img_h - y0
        if f == 2:  # flipped along W -> mirror x
            x0, x1 = img_w - x1, img_w - x0
        return jnp.stack([x0, y0, x1, y1], axis=-1)

    def _select_tta(self, variables, img):
        b, img_h, img_w, _ = img.shape
        bs, ss, cs = [], [], []
        for s, f in zip(self.cfg.tta_scales, self.cfg.tta_flips):
            x = jnp.flip(img, axis=f) if f is not None else img
            x = scale_and_pad(x, s)
            boxes, scores, cls_ids = self._select(variables, x)
            bs.append(self._adjust_boxes(boxes, s, f, img_h, img_w))
            ss.append(scores)
            cs.append(cls_ids)
        return (jnp.concatenate(bs, axis=1), jnp.concatenate(ss, axis=1),
                jnp.concatenate(cs, axis=1))

    def _post_candidates(self, boxes, scores, cls_ids):
        use_pallas = self.cfg.use_pallas_nms
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        from ..ops.nms import nms_candidates

        out = nms_candidates(
            boxes, scores, cls_ids,
            iou_threshold=self.cfg.iou_threshold,
            max_keep=self.cfg.max_keep,
            class_aware=self.cfg.class_aware,
            merge_boxes=self.cfg.merge_boxes,
            use_pallas=use_pallas,
            nms_mode=self.cfg.nms_mode,
            merge_write_boxes=self.cfg.merge_write_boxes,
            merge_gate_max=self.cfg.merge_gate_max,
        )
        return self._finalize(out)

    def _run(self, variables, img):
        img = img.astype(jnp.float32)
        if self.select_fn is not None:
            if self.cfg.use_tta:
                boxes, scores, cls_ids = self._select_tta(variables, img)
            else:
                boxes, scores, cls_ids = self._select(variables, img)
            return self._post_candidates(boxes, scores, cls_ids)
        if self.cfg.use_tta:
            preds = self._infer_tta(variables, img)
        else:
            preds = self._infer(variables, img)
        return self._post(preds)

    def _run_tta_branches(self, variables, img):
        """Independent per-branch detections for WBF (no merged NMS):
        returns (n_branches, B, max_keep, 6)."""
        img = img.astype(jnp.float32)
        b, img_h, img_w, _ = img.shape
        outs = []
        for s, f in zip(self.cfg.tta_scales, self.cfg.tta_flips):
            x = jnp.flip(img, axis=f) if f is not None else img
            x = scale_and_pad(x, s)
            if self.select_fn is not None:
                boxes, scores, cls_ids = self._select(variables, x)
                boxes = self._adjust_boxes(boxes, s, f, img_h, img_w)
                outs.append(self._post_candidates(boxes, scores, cls_ids))
                continue
            p = self._infer(variables, x)
            p = p.at[..., 0:4].set(p[..., 0:4] / s)
            if f == 1:
                p = p.at[..., 1].set(img_h - p[..., 1])
            if f == 2:
                p = p.at[..., 0].set(img_w - p[..., 0])
            outs.append(self._post(p))
        return jnp.stack(outs)

    def __call__(self, variables, img) -> jnp.ndarray:
        """img: (B, H, W, 3) uint8 or float in [0, 255] (uint8) / [0, 1].

        uint8 input is normalized on device. Returns (B, max_keep, 6)
        [x1, y1, x2, y2, conf, cls] in letterboxed input pixels; invalid
        slots have conf 0.
        """
        img = jnp.asarray(img)
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        return self._jitted(variables, img)

    def detect_wbf(self, variables, img):
        """TTA + Weighted Boxes Fusion: each TTA branch is postprocessed
        independently on device, then fused per image on host
        (trainer/eval_yolov5.py:44-92). Returns a list of per-image (n, 6)
        arrays (letterboxed coords), None where nothing survives."""
        from ..ops.wbf import weighted_boxes_fusion

        img = jnp.asarray(img)
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        branches = np.asarray(self._jitted_branches(variables, img))
        n_br, bsz = branches.shape[0], branches.shape[1]
        weights = list(self.cfg.wbf_weights or [1.0] * n_br)
        out = []
        for i in range(bsz):
            per_model = [
                branches[m, i][branches[m, i][:, 4] > 0] for m in range(n_br)
            ]
            fused = weighted_boxes_fusion(
                per_model, weights=weights, iou_thr=self.cfg.wbf_iou_threshold
            )
            out.append(fused if len(fused) else None)
        return out

    @staticmethod
    def to_host_detections(dets, infos=None) -> list:
        """(B, K, 6) device tensor -> list of per-image (n, 6) numpy arrays in
        original-image coordinates (None when an image has no detections).

        infos: optional (B, 5) [scale, pad_left, pad_top, org_w, org_h].
        """
        dets = np.asarray(dets)
        out = []
        for i in range(dets.shape[0]):
            d = dets[i]
            d = d[d[:, 4] > 0]
            if len(d) == 0:
                out.append(None)
                continue
            if infos is not None:
                scale, pad_l, pad_t, org_w, org_h = np.asarray(infos[i])
                d = d.copy()
                d[:, [0, 2]] = ((d[:, [0, 2]] - pad_l) / scale).clip(0, org_w)
                d[:, [1, 3]] = ((d[:, [1, 3]] - pad_t) / scale).clip(0, org_h)
            out.append(d)
        return out
