import numpy as np
import jax.numpy as jnp

from yoloseries_tpu.ops import (
    box_candidates,
    ciou,
    diou,
    giou,
    iou,
    pairwise_iou,
    tblr2xyxy,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2tblr,
    xyxy2xywh,
    xyxy2xywhn,
)


def rand_xyxy(rng, n):
    xy = rng.uniform(0, 500, size=(n, 2))
    wh = rng.uniform(1, 200, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_xyxy_xywh_roundtrip(rng):
    boxes = rand_xyxy(rng, 64)
    back = np.asarray(xywh2xyxy(xyxy2xywh(boxes)))
    np.testing.assert_allclose(back, boxes, rtol=1e-5, atol=1e-3)


def test_xyxy2xywhn_matches_manual(rng):
    boxes = rand_xyxy(rng, 16)
    out = np.asarray(xyxy2xywhn(boxes, (640, 480)))
    cx = (boxes[:, 0] + boxes[:, 2]) / 2 / 640
    cy = (boxes[:, 1] + boxes[:, 3]) / 2 / 480
    w = (boxes[:, 2] - boxes[:, 0]) / 640
    h = (boxes[:, 3] - boxes[:, 1]) / 480
    np.testing.assert_allclose(out, np.stack([cx, cy, w, h], 1), rtol=1e-5)
    back = np.asarray(xywhn2xyxy(out, (640, 480)))
    np.testing.assert_allclose(back, boxes, rtol=1e-4, atol=1e-2)


def test_tblr_roundtrip(rng):
    boxes = rand_xyxy(rng, 8)[None]  # (1, 8, 4)
    grid = rng.uniform(0, 500, size=(8, 2)).astype(np.float32)
    tblr = xyxy2tblr(jnp.asarray(boxes), jnp.asarray(grid))
    back = np.asarray(tblr2xyxy(tblr, jnp.asarray(grid)))
    np.testing.assert_allclose(back, boxes, rtol=1e-5, atol=1e-3)


def test_pairwise_iou_golden():
    b1 = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], dtype=np.float32)
    b2 = np.array([[0, 0, 10, 10], [10, 10, 20, 20]], dtype=np.float32)
    out = np.asarray(pairwise_iou(b1, b2))
    # manual: [1, 0], [25/175, 25/175]
    np.testing.assert_allclose(out[0], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[1], [25 / 175, 25 / 175], atol=1e-6)


def test_iou_identical_is_one(rng):
    b = rand_xyxy(rng, 32)
    np.testing.assert_allclose(np.asarray(iou(b, b)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ciou(b, b)), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(giou(b, b)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(diou(b, b)), 1.0, atol=1e-5)


def test_iou_variant_ordering(rng):
    """giou/diou/ciou <= iou, all in [-1, 1]."""
    b1 = rand_xyxy(rng, 128)
    b2 = rand_xyxy(rng, 128)
    i = np.asarray(iou(b1, b2))
    # giou/diou stay in [-1, 1]; ciou's two penalty terms can push it to -2
    for fn, lo in ((giou, -1.0), (diou, -1.0), (ciou, -2.0)):
        v = np.asarray(fn(b1, b2))
        assert np.all(v <= i + 1e-5)
        assert np.all(v >= lo - 1e-5)
        assert np.all(v <= 1.0 + 1e-5)


def test_ciou_penalizes_distance():
    a = np.array([[0, 0, 10, 10]], dtype=np.float32)
    near = np.array([[2, 2, 12, 12]], dtype=np.float32)
    far = np.array([[50, 50, 60, 60]], dtype=np.float32)
    assert float(ciou(a, near)[0]) > float(ciou(a, far)[0])
    # disjoint boxes: plain IoU is 0, CIoU is negative
    assert float(ciou(a, far)[0]) < 0.0


def test_box_candidates():
    before = np.array([[0, 0, 100, 100]], dtype=np.float32)
    good = np.array([[0, 0, 80, 80]], dtype=np.float32)
    tiny = np.array([[0, 0, 1, 1]], dtype=np.float32)
    skinny = np.array([[0, 0, 100, 3]], dtype=np.float32)
    assert bool(box_candidates(before, good)[0])
    assert not bool(box_candidates(before, tiny)[0])
    assert not bool(box_candidates(before, skinny)[0])
