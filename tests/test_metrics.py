import numpy as np

from yoloseries_tpu.ops import DetectionMetrics, compute_tp
from yoloseries_tpu.ops.metrics import IOU_THRESHOLDS


def test_compute_tp_perfect_match():
    gt = np.array([[0, 0, 100, 100, 0]], dtype=np.float64)
    pred = np.array([[0, 0, 100, 100, 0.9, 0]], dtype=np.float64)
    tp = compute_tp(gt, pred)
    assert tp.shape == (1, 10)
    assert tp.all()  # IoU 1.0 passes every threshold


def test_compute_tp_wrong_class():
    gt = np.array([[0, 0, 100, 100, 0]], dtype=np.float64)
    pred = np.array([[0, 0, 100, 100, 0.9, 1]], dtype=np.float64)
    assert not compute_tp(gt, pred).any()


def test_compute_tp_one_to_one_matching():
    # two predictions on one gt: only the higher-IoU one is a TP
    gt = np.array([[0, 0, 100, 100, 0]], dtype=np.float64)
    pred = np.array(
        [
            [0, 0, 100, 100, 0.9, 0],
            [5, 5, 105, 105, 0.95, 0],
        ],
        dtype=np.float64,
    )
    tp = compute_tp(gt, pred)
    assert tp[:, 0].sum() == 1  # exactly one TP at IoU 0.5


def test_compute_tp_partial_iou():
    # IoU = 50*100 / (100*100*2 - 50*100) = 1/3 -> below 0.5, no TP
    gt = np.array([[0, 0, 100, 100, 0]], dtype=np.float64)
    pred = np.array([[50, 0, 150, 100, 0.9, 0]], dtype=np.float64)
    assert not compute_tp(gt, pred).any()
    # IoU = 90*100/(2*100*100 - 90*100) ≈ 0.818 -> TP at 0.5..0.8, not 0.85+
    pred2 = np.array([[10, 0, 110, 100, 0.9, 0]], dtype=np.float64)
    tp = compute_tp(gt, pred2)
    iou_val = 9000 / 11000
    np.testing.assert_array_equal(tp[0], iou_val >= IOU_THRESHOLDS)


def test_map_perfect_detector():
    m = DetectionMetrics()
    rng = np.random.default_rng(0)
    for _ in range(10):
        boxes = rng.uniform(0, 300, size=(3, 2))
        wh = rng.uniform(20, 80, size=(3, 2))
        gt = np.concatenate(
            [boxes, boxes + wh, rng.integers(0, 3, size=(3, 1))], axis=1
        )
        pred = np.concatenate(
            [gt[:, :4], np.full((3, 1), 0.9), gt[:, [4]]], axis=1
        )
        m.add_image(gt, pred)
    out = m.compute()
    assert out["map50"] > 0.99
    assert out["map"] > 0.99


def test_map_half_detector():
    """Detector finds every box of class 0 but misses class 1 -> mAP50 = 0.5."""
    m = DetectionMetrics()
    for i in range(10):
        gt = np.array(
            [[0, 0, 100, 100, 0], [200, 200, 300, 300, 1]], dtype=np.float64
        )
        pred = np.array([[0, 0, 100, 100, 0.9, 0]], dtype=np.float64)
        m.add_image(gt, pred)
    out = m.compute()
    assert abs(out["map50"] - 0.5) < 0.02


def test_map_empty():
    m = DetectionMetrics()
    out = m.compute()
    assert out["map"] == 0.0 and out["map50"] == 0.0


def test_map_false_positives_reduce_precision():
    clean = DetectionMetrics()
    noisy = DetectionMetrics()
    rng = np.random.default_rng(1)
    for _ in range(5):
        gt = np.array([[0, 0, 100, 100, 0]], dtype=np.float64)
        good = np.array([[0, 0, 100, 100, 0.9, 0]], dtype=np.float64)
        fp = rng.uniform(200, 400, size=(5, 2))
        fps = np.concatenate(
            [fp, fp + 30, np.full((5, 1), 0.95), np.zeros((5, 1))], axis=1
        )
        clean.add_image(gt, good)
        noisy.add_image(gt, np.concatenate([good, fps], axis=0))
    assert noisy.compute()["map50"] < clean.compute()["map50"]


def test_confusion_matrix():
    from yoloseries_tpu.ops import ConfusionMatrix

    cm = ConfusionMatrix(num_class=3, conf_thres=0.25, iou_thres=0.45)
    gt = np.array([[0, 0, 100, 100, 1], [200, 200, 300, 300, 2]])
    pred = np.array([
        [0, 0, 100, 100, 0.9, 1],      # correct class 1
        [205, 205, 300, 300, 0.8, 0],  # class confusion: gt 2 predicted as 0
        [400, 400, 450, 450, 0.9, 2],  # false positive
        [0, 0, 50, 50, 0.1, 1],        # below conf -> ignored
    ])
    cm.add_image(gt, pred)
    assert cm.matrix[1, 1] == 1  # true positive class 1
    assert cm.matrix[0, 2] == 1  # gt 2 confused as 0
    assert cm.matrix[2, 3] == 1  # false positive (background col)
    # missed gt counted when nothing matches
    cm2 = ConfusionMatrix(num_class=3)
    cm2.add_image(gt, None)
    assert cm2.matrix[3, 1] == 1 and cm2.matrix[3, 2] == 1
