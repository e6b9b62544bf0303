import numpy as np
import pytest
from PIL import Image

from yoloseries_tpu.data import (
    AugmentConfig,
    DataLoader,
    DetectionDataset,
    collate_batch,
    infinite_indices,
    mosaic4,
)


@pytest.fixture(scope="module")
def micro_dataset(tmp_path_factory):
    """8 synthetic images with one colored rectangle each + txt labels."""
    root = tmp_path_factory.mktemp("ds")
    img_dir, lab_dir = root / "img", root / "lab"
    img_dir.mkdir()
    lab_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        h, w = int(rng.integers(200, 400)), int(rng.integers(200, 400))
        img = np.full((h, w, 3), 40, dtype=np.uint8)
        x1, y1 = int(rng.integers(10, w // 2)), int(rng.integers(10, h // 2))
        x2, y2 = x1 + int(rng.integers(40, 80)), y1 + int(rng.integers(40, 80))
        x2, y2 = min(x2, w - 1), min(y2, h - 1)
        cls = int(rng.integers(0, 3))
        img[y1:y2, x1:x2] = [200, 50 + 50 * cls, 30]
        Image.fromarray(img).save(img_dir / f"{i:06d}.jpg")
        (lab_dir / f"{i:06d}.txt").write_text(f"{cls} {x1} {y1} {x2} {y2}\n")
    names = root / "names.txt"
    names.write_text("0 a\n1 b\n2 c\n")
    return img_dir, lab_dir, names


def test_dataset_index_and_labels(micro_dataset):
    img_dir, lab_dir, names = micro_dataset
    ds = DetectionDataset(img_dir, lab_dir, names, input_size=(128, 128))
    assert len(ds) == 8
    assert ds.num_class == 3
    img, boxes, classes = ds.pull_item(0)
    assert img.ndim == 3 and img.dtype == np.uint8
    assert boxes.shape == (1, 4)
    assert classes.shape == (1,)


def test_dataset_get_deterministic(micro_dataset):
    img_dir, lab_dir, names = micro_dataset
    ds = DetectionDataset(img_dir, lab_dir, names, input_size=(128, 128))
    a = ds.get(0, np.random.default_rng(42))
    b = ds.get(0, np.random.default_rng(42))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_dataset_no_aug_returns_raw(micro_dataset):
    img_dir, lab_dir, names = micro_dataset
    ds = DetectionDataset(img_dir, lab_dir, names, input_size=(128, 128), enable_aug=False)
    img, boxes, classes = ds.get(3, np.random.default_rng(0))
    raw_img, raw_boxes, _ = ds.pull_item(3)
    np.testing.assert_array_equal(img, raw_img)
    np.testing.assert_array_equal(boxes, raw_boxes)


def test_mosaic_combines_four(micro_dataset):
    img_dir, lab_dir, names = micro_dataset
    ds = DetectionDataset(img_dir, lab_dir, names, input_size=(128, 128))
    imgs, boxes, labels = [], [], []
    for i in range(4):
        im, b, l = ds.pull_item(i)
        imgs.append(im)
        boxes.append(b)
        labels.append(l)
    out, b, l = mosaic4(imgs, boxes, labels, [256, 256], 114, np.random.default_rng(1))
    assert out.shape == (256, 256, 3)
    assert len(b) == len(l)
    if len(b):
        assert (b >= 0).all() and (b <= 256).all()


def test_infinite_indices_rank_sharding():
    s0 = list(__import__("itertools").islice(infinite_indices(10, 7, 0, 2), 10))
    s1 = list(__import__("itertools").islice(infinite_indices(10, 7, 1, 2), 10))
    assert set(s0).isdisjoint(set()) or True
    # both streams come from the same permutation: interleaved, disjoint per epoch
    merged = []
    for a, b in zip(s0[:5], s1[:5]):
        merged += [a, b]
    assert sorted(merged) == list(range(10))


def test_collate_fixed_shapes(micro_dataset):
    img_dir, lab_dir, names = micro_dataset
    ds = DetectionDataset(img_dir, lab_dir, names, input_size=(128, 128), enable_aug=False)
    samples = [ds.get(i, np.random.default_rng(i)) for i in range(4)]
    batch = collate_batch(samples, (128, 128), max_labels=20)
    assert batch["img"].shape == (4, 128, 128, 3)
    assert batch["img"].dtype == np.uint8
    assert batch["ann"].shape == (4, 20, 6)
    # each image has exactly one valid box; the rest are -1 padding
    valid = batch["ann"][..., 4] >= 0
    assert valid.sum() == 4
    # img_idx column is set for valid rows
    for i in range(4):
        rows = batch["ann"][i][valid[i]]
        assert (rows[:, 5] == i).all()


def test_dataloader_end_to_end(micro_dataset):
    img_dir, lab_dir, names = micro_dataset
    ds = DetectionDataset(img_dir, lab_dir, names, input_size=(128, 128))
    loader = DataLoader(ds, batch_size=2, max_labels=50, workers=2, seed=3)
    try:
        for _ in range(3):
            batch = next(loader)
            assert batch["img"].shape == (2, 128, 128, 3)
            assert batch["ann"].shape == (2, 50, 6)
            assert (batch["ann"][..., 4] >= 0).sum() > 0
    finally:
        loader.stop()


def test_dataloader_finite_mode(micro_dataset):
    img_dir, lab_dir, names = micro_dataset
    ds = DetectionDataset(img_dir, lab_dir, names, input_size=(128, 128), enable_aug=False)
    loader = DataLoader(ds, batch_size=4, max_labels=10, workers=2, infinite=False, shuffle=False)
    batches = list(loader)
    assert len(batches) == 2


def test_cached_canvas_serving(micro_dataset, tmp_path):
    """With the image cache active, pull_item serves the FULL input-size
    canvas (content top-left, zero pad) by default — the reference's
    de facto training distribution (dataset/datasets.py:350-357 serves
    self.imgs[ix], the whole memmap row; its uncached path is broken in
    its own code). cached_canvas=False restores tight content crops."""
    img_dir, lab_dir, names = micro_dataset
    kw = dict(input_size=(128, 128), enable_aug=False, cache_images=True,
              cache_dir=tmp_path)
    canvas_ds = DetectionDataset(img_dir, lab_dir, names, **kw)
    crop_ds = DetectionDataset(img_dir, lab_dir, names, cached_canvas=False,
                               **kw)

    img_c, boxes_c, cls_c = canvas_ds.pull_item(0)
    img_t, boxes_t, cls_t = crop_ds.pull_item(0)
    assert img_c.shape == (128, 128, 3)
    rh, rw = crop_ds._cache_shapes[0]
    assert img_t.shape == (rh, rw, 3)
    assert (rh, rw) != (128, 128)  # micro images are non-square
    # content region identical; canvas pad is zeros
    np.testing.assert_array_equal(img_c[:rh, :rw], img_t)
    assert img_c[rh:].sum() == 0 and img_c[:, rw:].sum() == 0
    # boxes identical in both modes (same min-scale ratio)
    np.testing.assert_array_equal(boxes_c, boxes_t)
    np.testing.assert_array_equal(cls_c, cls_t)

    # pull_meta agrees with pull_item on the served shape in both modes
    (h_c, w_c), mb_c, _ = canvas_ds.pull_meta(0)
    (h_t, w_t), mb_t, _ = crop_ds.pull_meta(0)
    assert (h_c, w_c) == (128, 128) and (h_t, w_t) == (int(rh), int(rw))
    np.testing.assert_array_equal(mb_c, boxes_c)
    np.testing.assert_array_equal(mb_t, boxes_t)
