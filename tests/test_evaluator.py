import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloseries_tpu.evaluation import EvalConfig, Evaluator, decode_yolov5, scale_and_pad
from yoloseries_tpu.ops import YOLOV5_ANCHORS

ANCHORS = jnp.asarray(YOLOV5_ANCHORS)


@pytest.mark.slow
def test_decode_zero_logits_golden():
    """sigmoid(0)=0.5 -> xy=(0.5+grid)*stride (cell centers), wh=anchor."""
    size, nc = 64, 3
    preds = [jnp.zeros((1, size // s, size // s, 3 * (5 + nc))) for s in (8, 16, 32)]
    out = np.asarray(decode_yolov5(preds, ANCHORS))
    n_expected = sum((size // s) ** 2 * 3 for s in (8, 16, 32))
    assert out.shape == (1, n_expected, 5 + nc)
    # first stage, first cell, anchor 0: xy = 0.5*8 = 4, wh = (10, 13)
    np.testing.assert_allclose(out[0, 0, 0:2], [4.0, 4.0], atol=1e-5)
    np.testing.assert_allclose(out[0, 0, 2:4], [10.0, 13.0], atol=1e-4)
    # cell (0, 1) -> x = 1.5*8 = 12
    np.testing.assert_allclose(out[0, 3, 0:2], [12.0, 4.0], atol=1e-5)
    # obj/cls are sigmoid(0) = 0.5
    np.testing.assert_allclose(out[0, :, 4], 0.5, atol=1e-6)


def test_scale_and_pad_shapes():
    img = jnp.ones((1, 64, 64, 3))
    out = scale_and_pad(img, 0.83)
    assert out.shape == (1, 64, 64, 3)  # 53 -> padded back to 64
    assert abs(float(out[0, 60, 60, 0]) - 0.447) < 1e-6  # pad value
    assert scale_and_pad(img, 1.0) is img


def _toy_apply(planted_xy, planted_cls, nc=3, size=64):
    """apply_fn placing one confident detection at a known location."""

    def apply_fn(variables, img, train=False):
        del variables, train
        b = img.shape[0]
        outs = []
        for s in (8, 16, 32):
            h = w = size // s
            m = np.full((b, h, w, 3, 5 + nc), -10.0, np.float32)
            if s == 8:
                gx, gy = int(planted_xy[0] / s), int(planted_xy[1] / s)
                m[:, gy, gx, 0, 0:2] = 0.0  # center of cell
                m[:, gy, gx, 0, 2:4] = 0.0  # wh = anchor
                m[:, gy, gx, 0, 4] = 10.0  # obj
                m[:, gy, gx, 0, 5 + planted_cls] = 10.0
            outs.append(jnp.asarray(m.reshape(b, h, w, 3 * (5 + nc))))
        return outs

    return apply_fn


@pytest.mark.slow
def test_evaluator_end_to_end_single_detection():
    size, nc = 64, 3
    apply_fn = _toy_apply((24, 40), planted_cls=1, nc=nc, size=size)
    cfg = EvalConfig(conf_threshold=0.3, cls_threshold=0.3, iou_threshold=0.5,
                     num_candidates=64, max_keep=10, merge_boxes=False)
    ev = Evaluator(apply_fn, lambda p: decode_yolov5(p, ANCHORS), cfg)
    img = np.zeros((2, size, size, 3), dtype=np.uint8)
    dets = np.asarray(ev({}, img))
    assert dets.shape == (2, 10, 6)
    valid = dets[0][dets[0][:, 4] > 0]
    assert len(valid) == 1
    # planted at cell center (24+4, 40+4), wh = anchor (10, 13)
    cx = (valid[0, 0] + valid[0, 2]) / 2
    cy = (valid[0, 1] + valid[0, 3]) / 2
    assert abs(cx - 28) < 1.0 and abs(cy - 44) < 1.0
    assert int(valid[0, 5]) == 1
    assert valid[0, 4] > 0.9


def test_evaluator_to_host_unletterbox():
    dets = np.zeros((1, 5, 6), dtype=np.float32)
    dets[0, 0] = [100, 120, 200, 220, 0.9, 2]
    # scale 0.5, pad_left 10, pad_top 20, org 500x400
    infos = np.array([[0.5, 10, 20, 500, 400]], dtype=np.float32)
    out = Evaluator.to_host_detections(jnp.asarray(dets), infos)
    assert len(out) == 1
    np.testing.assert_allclose(out[0][0, :4], [180, 200, 380, 400], atol=1e-4)


@pytest.mark.slow
def test_evaluator_tta_shapes():
    size, nc = 64, 3
    apply_fn = _toy_apply((24, 40), planted_cls=0, nc=nc, size=size)
    cfg = EvalConfig(conf_threshold=0.3, cls_threshold=0.25, iou_threshold=0.5,
                     num_candidates=64, max_keep=10, merge_boxes=False,
                     use_tta=True, tta_scales=(1.0, 0.5), tta_flips=(None, 2))
    ev = Evaluator(apply_fn, lambda p: decode_yolov5(p, ANCHORS), cfg)
    dets = np.asarray(ev({}, np.zeros((1, size, size, 3), dtype=np.uint8)))
    assert dets.shape == (1, 10, 6)
    assert (dets[0][:, 4] > 0).sum() >= 1


@pytest.mark.slow
def test_evaluator_wbf_tta():
    size, nc = 64, 3
    apply_fn = _toy_apply((24, 40), planted_cls=1, nc=nc, size=size)
    cfg = EvalConfig(conf_threshold=0.3, cls_threshold=0.25, iou_threshold=0.5,
                     num_candidates=64, max_keep=10, merge_boxes=False,
                     use_tta=True, tta_scales=(1.0, 0.5), tta_flips=(None, 2),
                     use_wbf=True)
    ev = Evaluator(apply_fn, lambda p: decode_yolov5(p, ANCHORS), cfg)
    outs = ev.detect_wbf({}, np.zeros((2, size, size, 3), dtype=np.uint8))
    assert len(outs) == 2
    assert outs[0] is not None and outs[0].shape[1] == 6
    # fused box stays near the planted center (28, 44)
    cx = (outs[0][0, 0] + outs[0][0, 2]) / 2
    assert abs(cx - 28) < 3


@pytest.mark.slow
def test_evaluator_wbf_tta_fused_select():
    """WBF branch path with the fused select_fn must match the planted box
    like the dense path does (detect_wbf -> _run_tta_branches -> select)."""
    from yoloseries_tpu.evaluation import decode_topk_yolov5

    size, nc = 64, 3
    apply_fn = _toy_apply((24, 40), planted_cls=1, nc=nc, size=size)
    cfg = EvalConfig(conf_threshold=0.3, cls_threshold=0.25, iou_threshold=0.5,
                     num_candidates=64, max_keep=10, merge_boxes=False,
                     use_tta=True, tta_scales=(1.0, 0.5), tta_flips=(None, 2),
                     use_wbf=True)
    select_fn = lambda p: decode_topk_yolov5(
        p, ANCHORS, k=cfg.num_candidates,
        conf_threshold=cfg.conf_threshold, cls_threshold=cfg.cls_threshold,
    )
    ev = Evaluator(apply_fn, lambda p: decode_yolov5(p, ANCHORS), cfg,
                   select_fn=select_fn)
    outs = ev.detect_wbf({}, np.zeros((2, size, size, 3), dtype=np.uint8))
    assert len(outs) == 2
    assert outs[0] is not None and outs[0].shape[1] == 6
    cx = (outs[0][0, 0] + outs[0][0, 2]) / 2
    assert abs(cx - 28) < 3
