import json

import numpy as np
import pytest
from PIL import Image

from yoloseries_tpu.data.builders import build_coco_dataset, build_voc_dataset
from yoloseries_tpu.nn.deploy import fold_conv_bn, fold_repconv_params
from yoloseries_tpu.ops import weighted_boxes_fusion
from yoloseries_tpu.ops.kmeans_anchors import kmeans_anchors
from yoloseries_tpu.utils.visualize import (
    detection_report,
    draw_detections,
    save_pred_vs_gt,
)


def test_coco_builder(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for name in ("a.jpg", "b.jpg"):
        Image.fromarray(np.zeros((50, 60, 3), np.uint8)).save(src / name)
    ann = {
        "images": [
            {"id": 1, "file_name": "a.jpg"},
            {"id": 2, "file_name": "b.jpg"},
        ],
        "categories": [
            {"id": 7, "name": "cat"},
            {"id": 21, "name": "dog"},
        ],
        "annotations": [
            {"image_id": 1, "category_id": 7, "bbox": [5, 5, 20, 15], "iscrowd": 0},
            {"image_id": 1, "category_id": 21, "bbox": [1, 1, 10, 10], "iscrowd": 0},
            {"image_id": 2, "category_id": 21, "bbox": [0, 0, 5, 5], "iscrowd": 1},
        ],
    }
    ann_path = tmp_path / "inst.json"
    ann_path.write_text(json.dumps(ann))
    n_img, n_box = build_coco_dataset(ann_path, src, tmp_path / "out")
    assert n_img == 2 and n_box == 2  # crowd box skipped
    lab = (tmp_path / "out" / "lab" / "a.txt").read_text().strip().splitlines()
    assert lab[0].split()[0] == "0"  # cat id 7 -> contiguous 0
    assert lab[0].split()[1:] == ["5.00", "5.00", "25.00", "20.00"]  # xywh->xyxy
    names = (tmp_path / "out" / "names.txt").read_text()
    assert "0 cat" in names and "1 dog" in names


def test_voc_builder(tmp_path):
    root = tmp_path / "VOC"
    (root / "Annotations").mkdir(parents=True)
    (root / "JPEGImages").mkdir()
    Image.fromarray(np.zeros((40, 40, 3), np.uint8)).save(
        root / "JPEGImages" / "x.jpg"
    )
    (root / "Annotations" / "x.xml").write_text(
        "<annotation><object><name>bus</name><bndbox>"
        "<xmin>1</xmin><ymin>2</ymin><xmax>30</xmax><ymax>35</ymax>"
        "</bndbox></object></annotation>"
    )
    n_img, n_box = build_voc_dataset(root, tmp_path / "out")
    assert n_img == 1 and n_box == 1
    assert "0 bus" in (tmp_path / "out" / "names.txt").read_text()


def test_kmeans_anchors():
    rng = np.random.default_rng(0)
    # three distinct size clusters
    whs = np.concatenate([
        rng.normal(20, 2, (200, 2)),
        rng.normal(80, 5, (200, 2)),
        rng.normal(200, 10, (200, 2)),
    ])
    anchors, miou = kmeans_anchors(whs, k=3, seed=1)
    assert anchors.shape == (3, 2)
    assert miou > 0.8
    centers = np.sort(anchors[:, 0])
    assert abs(centers[0] - 20) < 6 and abs(centers[2] - 200) < 25


def test_wbf_fuses_overlapping():
    m1 = np.array([[0, 0, 100, 100, 0.9, 0], [200, 200, 250, 250, 0.8, 1]])
    m2 = np.array([[2, 2, 102, 102, 0.7, 0]])
    out = weighted_boxes_fusion([m1, m2], weights=[2, 1], iou_thr=0.5)
    # the two class-0 boxes fuse into one; class-1 box stays
    assert len(out) == 2
    cls0 = out[out[:, 5] == 0][0]
    assert 0 <= cls0[0] <= 2 and 100 <= cls0[2] <= 102
    # fused score = (0.9*2 + 0.7*1) / 3
    assert abs(cls0[4] - (0.9 * 2 + 0.7) / 3) < 1e-6


@pytest.mark.slow
def test_fold_conv_bn_matches_unfused():
    import jax
    import jax.numpy as jnp

    from yoloseries_tpu.nn import ConvBnAct

    m = ConvBnAct(8, 3, 1)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 4)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    # give BN non-trivial stats
    stats = jax.tree.map(lambda a: a, v["batch_stats"])
    stats["bn"]["mean"] = jnp.asarray(np.random.default_rng(1).normal(0, 0.5, 8).astype(np.float32))
    stats["bn"]["var"] = jnp.asarray(np.random.default_rng(2).uniform(0.5, 2, 8).astype(np.float32))
    ref = m.apply({"params": v["params"], "batch_stats": stats}, x, train=False)

    folded_params, folded_stats = fold_conv_bn(v["params"], stats)
    out = m.apply({"params": folded_params, "batch_stats": folded_stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)


def test_fold_repconv_matches_three_branch():
    import jax
    import jax.numpy as jnp

    from yoloseries_tpu.nn import RepConv

    m = RepConv(8, act=False)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 12, 12, 8)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    stats = v["batch_stats"]
    ref = m.apply(v, x, train=False)

    kernel, bias = fold_repconv_params(v["params"], stats)
    out = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)


def test_visualize_draw_and_report():
    img = np.zeros((100, 100, 3), np.uint8)
    dets = np.array([[10, 10, 50, 50, 0.9, 0], [60, 60, 90, 90, 0.7, 1]])
    out = draw_detections(img, dets, names=["cat", "dog"])
    assert out.shape == img.shape
    assert out.sum() > 0  # something was drawn
    rep = detection_report(dets, names=["cat", "dog"], use_emoji=True)
    assert "1" in rep and ("🐱" in rep or "cat" in rep)
    assert detection_report(None) == "no detections"


def test_save_pred_vs_gt(tmp_path):
    img = np.zeros((64, 64, 3), np.uint8)
    dets = np.array([[5, 5, 30, 30, 0.8, 0]])
    gts = np.array([[6, 6, 31, 31, 0]])
    save_pred_vs_gt(img, dets, gts, tmp_path / "panel.png")
    assert (tmp_path / "panel.png").exists()


def test_dataset_image_cache(tmp_path):
    from yoloseries_tpu.data import DetectionDataset

    img_dir, lab_dir = tmp_path / "img", tmp_path / "lab"
    img_dir.mkdir()
    lab_dir.mkdir()
    for i in range(3):
        Image.fromarray(
            np.full((100 + i * 40, 200, 3), 50 + i, np.uint8)
        ).save(img_dir / f"{i}.jpg")
        (lab_dir / f"{i}.txt").write_text("0 10 10 80 60\n")
    ds = DetectionDataset(img_dir, lab_dir, input_size=(64, 64),
                          cache_images=True, cache_dir=tmp_path)
    # default with the cache: reference-parity FULL canvas serving
    # (content top-left, zero pad — dataset/datasets.py:350-357)
    img, boxes, classes = ds.pull_item(0)
    assert img.shape == (64, 64, 3)
    assert img[32:].sum() == 0  # pad rows below the 32-px content
    np.testing.assert_allclose(boxes[0], np.array([10, 10, 80, 60]) * 0.32, rtol=1e-5)
    # cached_canvas=False: tight min-scale crop, r = min(64/100, 64/200)
    ds2 = DetectionDataset(img_dir, lab_dir, input_size=(64, 64),
                           cache_images=True, cache_dir=tmp_path,
                           cached_canvas=False)
    img2, boxes2, _ = ds2.pull_item(0)
    assert img2.shape[0] == 32 and img2.shape[1] == 64
    np.testing.assert_array_equal(img[:32], img2)
    np.testing.assert_allclose(boxes2, boxes, rtol=1e-7)


def test_multilabel_postprocess():
    import jax.numpy as jnp

    from yoloseries_tpu.ops import postprocess_detections

    # one box confidently two classes -> multi_label yields two detections
    pred = np.zeros((1, 128, 8), np.float32)  # nc=3
    pred[0, 0] = [50, 50, 30, 30, 0.95, 0.9, 0.85, 0.01]
    out_ml = np.asarray(postprocess_detections(
        jnp.asarray(pred[0]), 0.3, 0.3, 0.5, num_candidates=64, max_keep=10,
        class_aware=True, merge_boxes=False, multi_label=True,
    ))
    valid = out_ml[out_ml[:, 4] > 0]
    assert len(valid) == 2
    assert sorted(valid[:, 5].astype(int).tolist()) == [0, 1]
    out_sl = np.asarray(postprocess_detections(
        jnp.asarray(pred[0]), 0.3, 0.3, 0.5, num_candidates=64, max_keep=10,
        merge_boxes=False, multi_label=False,
    ))
    assert (out_sl[:, 4] > 0).sum() == 1


def test_soft_nms_postprocess():
    import jax.numpy as jnp

    from yoloseries_tpu.ops import postprocess_detections

    pred = np.zeros((1, 128, 7), np.float32)  # nc=2
    pred[0, 0] = [50, 50, 30, 30, 0.9, 0.95, 0.01]
    pred[0, 1] = [52, 52, 30, 30, 0.85, 0.9, 0.01]  # heavy overlap
    out = np.asarray(postprocess_detections(
        jnp.asarray(pred[0]), 0.3, 0.3, 0.5, num_candidates=64, max_keep=10,
        class_aware=False, merge_boxes=False, nms_mode="soft_linear",
    ))
    valid = out[out[:, 4] > 0]
    # soft-NMS keeps both but decays the second's score
    assert len(valid) == 2
    assert valid[1, 4] < 0.85 * 0.9


@pytest.mark.slow
def test_crop_classifier_forward():
    import jax
    import jax.numpy as jnp

    from yoloseries_tpu.models.classifier import CropClassifier

    m = CropClassifier(num_class=4, resnet_layers=(1, 1, 1, 1))
    x = jnp.zeros((2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    logits = m.apply(v, x, train=False)
    assert logits.shape == (2, 4)


def test_crop_classifier_dataset(tmp_path):
    """Filename-contract parity with auxiliary_classifier_dataloader.py:20-28
    + ImageNet normalization + drop_last batching."""
    from PIL import Image
    import numpy as np

    from yoloseries_tpu.data.classifier_data import (
        CropClassificationDataset, crop_classifier_batches,
    )

    rng = np.random.default_rng(0)
    for i in range(5):
        arr = rng.integers(0, 255, (30 + i, 41, 3), dtype=np.uint8)
        # reference layout: split('_')[2][5:] -> class, [3] -> label
        Image.fromarray(arr).save(tmp_path / f"im_{i}_class{i % 3}_lab{i}_x.png")

    ds = CropClassificationDataset(tmp_path, img_size=(32, 32))
    assert len(ds) == 5
    img, cls, lab = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert cls == 0 and lab == "lab0"

    batches = list(crop_classifier_batches(tmp_path, (32, 32), batch_size=2,
                                           shuffle=False))
    assert len(batches) == 2  # drop_last
    assert batches[0]["img"].shape == (2, 32, 32, 3)
    assert batches[0]["cls"].tolist() == [0, 1]


@pytest.mark.slow
def test_deploy_fold_detections_identical():
    """The cli/detect.py --fuse path (detect_yolov5.py:110-117 parity): a
    whole yolov5s variables tree folded by fold_conv_bn must produce the
    SAME detections through the public Evaluator as the unfused tree."""
    import jax
    import jax.numpy as jnp

    from yoloseries_tpu.evaluation import EvalConfig, Evaluator
    from yoloseries_tpu.families import get_family
    from yoloseries_tpu.models import create_model

    nc, size = 4, 96
    model = create_model("yolov5s", num_class=nc)
    v = model.init(jax.random.PRNGKey(3), jnp.zeros((1, size, size, 3)),
                   train=False)
    # non-trivial BN stats everywhere
    rng = np.random.default_rng(5)
    stats = jax.tree.map(
        lambda a: jnp.asarray(
            rng.uniform(0.5, 2.0, a.shape).astype(np.float32)),
        v["batch_stats"],
    )
    fam = get_family("yolov5s")
    cfg = EvalConfig(conf_threshold=0.001, cls_threshold=0.001,
                     iou_threshold=0.65, num_candidates=256, max_keep=50)
    ev = Evaluator(model.apply, fam.make_decode({}, nc, (size, size)), cfg)
    x = np.random.default_rng(7).uniform(0, 1, (1, size, size, 3)).astype(np.float32)

    base = np.asarray(ev({"params": v["params"], "batch_stats": stats}, x))
    p_f, s_f = fold_conv_bn(v["params"], stats)
    fused = np.asarray(ev({"params": p_f, "batch_stats": s_f}, x))
    np.testing.assert_allclose(fused, base, rtol=2e-3, atol=5e-3)
