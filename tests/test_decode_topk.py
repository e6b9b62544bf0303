"""Fused serving path (decode_topk_yolov5 + nms_candidates) must produce
the same detections as the dense path (decode_yolov5 + postprocess_detections
with identical thresholds). The fused path skips materializing the dense
(B, N, 5+nc) tensor (serving-throughput optimization)."""

import jax.numpy as jnp
import numpy as np

from yoloseries_tpu.evaluation import decode_topk_yolov5, decode_yolov5
from yoloseries_tpu.ops import YOLOV5_ANCHORS, nms_candidates, postprocess_detections


def make_preds(batch=2, size=64, nc=8, seed=3):
    rng = np.random.default_rng(seed)
    preds = []
    for s in (8, 16, 32):
        h = size // s
        # logits ~ N(0, 2): a healthy mix of confident and gated rows
        preds.append(jnp.asarray(
            rng.normal(0.0, 2.0, (batch, h, h, 3 * (5 + nc))).astype(np.float32)
        ))
    return preds


def run_both(conf=0.25, cls_thr=0.25, iou=0.45, k=64, max_keep=32,
             select="topk"):
    preds = make_preds()
    anchors = jnp.asarray(YOLOV5_ANCHORS)

    dense = decode_yolov5(preds, anchors)
    out_dense = postprocess_detections(
        dense, conf_threshold=conf, cls_threshold=cls_thr, iou_threshold=iou,
        num_candidates=k, max_keep=max_keep, merge_boxes=True,
    )

    boxes, scores, cls_ids = decode_topk_yolov5(
        preds, anchors, k=k, conf_threshold=conf, cls_threshold=cls_thr,
        select=select,
    )
    out_fused = nms_candidates(
        boxes, scores, cls_ids, iou_threshold=iou, max_keep=max_keep,
        merge_boxes=True,
    )
    return np.asarray(out_dense), np.asarray(out_fused)


def _sorted_rows(out):
    """Valid rows sorted by (score desc, cls, x) — candidate index order may
    differ between paths, detections must not."""
    rows = out[out[:, 4] > 0]
    order = np.lexsort((rows[:, 0], rows[:, 5], -rows[:, 4]))
    return rows[order]


def test_fused_matches_dense_serving_config():
    out_dense, out_fused = run_both()
    for b in range(out_dense.shape[0]):
        d, f = _sorted_rows(out_dense[b]), _sorted_rows(out_fused[b])
        assert d.shape == f.shape
        np.testing.assert_allclose(d, f, rtol=1e-5, atol=1e-4)


def test_fused_matches_dense_protocol_config():
    out_dense, out_fused = run_both(conf=0.001, cls_thr=0.001, iou=0.65, k=256)
    for b in range(out_dense.shape[0]):
        d, f = _sorted_rows(out_dense[b]), _sorted_rows(out_fused[b])
        assert d.shape == f.shape
        np.testing.assert_allclose(d, f, rtol=1e-5, atol=1e-4)


def test_sort_select_matches_dense():
    """The sort-based selection (dense 6-plane decode + one variadic stable
    sort — the large-K protocol engine, no gathers) must match the dense
    path exactly like the top-k engine does, at both threshold regimes."""
    for kw in (dict(), dict(conf=0.001, cls_thr=0.001, iou=0.65, k=256)):
        out_dense, out_fused = run_both(select="sort", **kw)
        for b in range(out_dense.shape[0]):
            d, f = _sorted_rows(out_dense[b]), _sorted_rows(out_fused[b])
            assert d.shape == f.shape
            np.testing.assert_allclose(d, f, rtol=1e-5, atol=1e-4)


def test_sort_select_matches_topk_order():
    """Candidate ORDER parity between the two engines (ties resolve to the
    lower flat index in both lax.top_k and the stable sort), including the
    v7 gate."""
    preds = make_preds(seed=11)
    anchors = jnp.asarray(YOLOV5_ANCHORS)
    for gate in ("v5", "v7"):
        a = decode_topk_yolov5(preds, anchors, k=128, conf_threshold=0.2,
                               cls_threshold=0.1, conf_gate=gate,
                               select="topk")
        b = decode_topk_yolov5(preds, anchors, k=128, conf_threshold=0.2,
                               cls_threshold=0.1, conf_gate=gate,
                               select="sort")
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-5, atol=1e-5)


def test_fused_all_background():
    """Every logit strongly negative -> zero valid candidates, no NaNs."""
    preds = [p * 0.0 - 12.0 for p in make_preds()]
    anchors = jnp.asarray(YOLOV5_ANCHORS)
    boxes, scores, cls_ids = decode_topk_yolov5(
        preds, anchors, k=32, conf_threshold=0.25, cls_threshold=0.25,
    )
    out = nms_candidates(boxes, scores, cls_ids, iou_threshold=0.45,
                         max_keep=16, merge_boxes=True)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert (out[..., 4] == 0).all()


def _sorted_pair(out_dense, out_fused):
    for b in range(out_dense.shape[0]):
        d, f = _sorted_rows(out_dense[b]), _sorted_rows(out_fused[b])
        assert d.shape == f.shape
        np.testing.assert_allclose(d, f, rtol=1e-5, atol=1e-4)


def test_fused_matches_dense_yolov7_gate():
    """yolov7 candidate gate: obj*cls >= conf_thr, non-strict
    (trainer/eval_yolov7.py:221,240) — not v5's obj >= conf_thr. Fused and
    dense paths must agree under thresholds where the two gates actually
    differ (cls_thr < conf_thr), and the v7 gate must provably change the
    candidate set vs the v5 gate on the same predictions."""
    preds = make_preds(seed=13)
    anchors = jnp.asarray(YOLOV5_ANCHORS)
    conf, cls_thr, iou, k, max_keep = 0.25, 0.05, 0.45, 64, 32

    dense = decode_yolov5(preds, anchors)
    out_dense = postprocess_detections(
        dense, conf_threshold=conf, cls_threshold=cls_thr, iou_threshold=iou,
        num_candidates=k, max_keep=max_keep, merge_boxes=True, conf_gate="v7",
    )
    boxes, scores, cls_ids = decode_topk_yolov5(
        preds, anchors, k=k, conf_threshold=conf, cls_threshold=cls_thr,
        conf_gate="v7",
    )
    out_fused = nms_candidates(boxes, scores, cls_ids, iou_threshold=iou,
                               max_keep=max_keep, merge_boxes=True)
    _sorted_pair(np.asarray(out_dense), np.asarray(out_fused))

    # sanity: at these thresholds the v5 gate admits rows the v7 gate
    # rejects (obj >= conf but obj*cls_max < conf) — i.e. the fixture
    # actually exercises the gate difference, so this test would catch a
    # v7 path silently using the v5 gate. Checked at the candidate-mask
    # level (post-NMS counts saturate at max_keep for both gates).
    d = np.asarray(dense)
    obj = d[..., 4]
    prod = obj * d[..., 5:].max(-1)
    mask_v5 = (obj >= conf) & (prod > cls_thr)
    mask_v7 = (prod >= conf) & (prod >= cls_thr)
    assert (mask_v5 & ~mask_v7).sum() > 0, "fixture never separates the gates"


def test_fused_matches_dense_yolox():
    from yoloseries_tpu.evaluation import decode_topk_yolox, decode_yolox

    nc, size = 8, 64
    rng = np.random.default_rng(5)
    preds = [
        jnp.asarray(rng.normal(0, 2.0, (2, size // s, size // s, 5 + nc))
                    .astype(np.float32))
        for s in (8, 16, 32)
    ]
    dense = decode_yolox(preds, nc)
    out_dense = postprocess_detections(
        dense, conf_threshold=0.25, cls_threshold=0.25, iou_threshold=0.45,
        num_candidates=64, max_keep=32, merge_boxes=True,
    )
    boxes, scores, cls_ids = decode_topk_yolox(
        preds, nc, k=64, conf_threshold=0.25, cls_threshold=0.25,
    )
    out_fused = nms_candidates(boxes, scores, cls_ids, iou_threshold=0.45,
                               max_keep=32, merge_boxes=True)
    _sorted_pair(np.asarray(out_dense), np.asarray(out_fused))


def test_fused_matches_dense_yolov8():
    from yoloseries_tpu.evaluation import decode_topk_yolov8, decode_yolov8

    nc, size, reg = 8, 64, 16
    rng = np.random.default_rng(7)
    preds = [
        jnp.asarray(rng.normal(0, 1.5, (2, size // s, size // s, 4 * reg + nc))
                    .astype(np.float32))
        for s in (4, 8, 16, 32)
    ]
    dense = decode_yolov8(preds, nc, (size, size), reg=reg)
    out_dense = postprocess_detections(
        dense, conf_threshold=0.25, cls_threshold=0.25, iou_threshold=0.45,
        num_candidates=64, max_keep=32, merge_boxes=True,
    )
    boxes, scores, cls_ids = decode_topk_yolov8(
        preds, nc, (size, size), k=64, conf_threshold=0.25, cls_threshold=0.25,
        reg=reg,
    )
    out_fused = nms_candidates(boxes, scores, cls_ids, iou_threshold=0.45,
                               max_keep=32, merge_boxes=True)
    _sorted_pair(np.asarray(out_dense), np.asarray(out_fused))


def test_fused_matches_dense_retinanet():
    from yoloseries_tpu.evaluation import decode_retinanet, decode_topk_retinanet
    from yoloseries_tpu.ops import pyramid_anchors

    nc = 6
    anchors = jnp.asarray(pyramid_anchors(np.array([64, 64])))
    A = anchors.shape[0]
    rng = np.random.default_rng(9)
    reg = jnp.asarray(rng.normal(0, 1.0, (2, A, 5)).astype(np.float32))
    cls = jnp.asarray(rng.normal(0, 2.0, (2, A, nc)).astype(np.float32))

    dense = decode_retinanet(reg, cls, anchors)
    out_dense = postprocess_detections(
        dense, conf_threshold=0.05, cls_threshold=0.3, iou_threshold=0.45,
        num_candidates=64, max_keep=32, merge_boxes=True,
    )
    boxes, scores, cls_ids = decode_topk_retinanet(
        reg, cls, anchors, k=64, conf_threshold=0.05, cls_threshold=0.3,
    )
    out_fused = nms_candidates(boxes, scores, cls_ids, iou_threshold=0.45,
                               max_keep=32, merge_boxes=True)
    _sorted_pair(np.asarray(out_dense), np.asarray(out_fused))


def test_fused_matches_dense_fcos():
    from yoloseries_tpu.evaluation import decode_fcos, decode_topk_fcos

    nc, size = 5, 64
    rng = np.random.default_rng(11)
    cls_fms, reg_fms, ctr_fms = [], [], []
    for s in (8, 16, 32):
        h = size // s
        cls_fms.append(jnp.asarray(rng.normal(0, 2.0, (2, h, h, nc)).astype(np.float32)))
        reg_fms.append(jnp.asarray(np.abs(rng.normal(0, 1.0, (2, h, h, 4))).astype(np.float32)))
        ctr_fms.append(jnp.asarray(rng.normal(0, 1.0, (2, h, h, 1)).astype(np.float32)))

    dense = decode_fcos(cls_fms, reg_fms, ctr_fms, (size, size))
    out_dense = postprocess_detections(
        dense, conf_threshold=0.2, cls_threshold=0.2, iou_threshold=0.45,
        num_candidates=64, max_keep=32, merge_boxes=True,
    )
    boxes, scores, cls_ids = decode_topk_fcos(
        cls_fms, reg_fms, ctr_fms, (size, size), k=64,
        conf_threshold=0.2, cls_threshold=0.2,
    )
    out_fused = nms_candidates(boxes, scores, cls_ids, iou_threshold=0.45,
                               max_keep=32, merge_boxes=True)
    _sorted_pair(np.asarray(out_dense), np.asarray(out_fused))
