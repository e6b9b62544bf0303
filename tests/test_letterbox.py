import numpy as np

from yoloseries_tpu.ops import (
    letterbox_boxes,
    letterbox_image,
    unletterbox_boxes_np,
)


def test_letterbox_training_shape():
    img = np.random.default_rng(0).integers(0, 255, (480, 640, 3), dtype=np.uint8)
    out, info = letterbox_image(img, 640, stride=32, training=True)
    assert out.shape == (640, 640, 3)
    assert info.scale == 1.0
    assert info.pad_top == 80 and info.pad_bottom == 80
    assert info.pad_left == 0 and info.pad_right == 0


def test_letterbox_stride_rounding():
    img = np.zeros((100, 100, 3), dtype=np.uint8)
    out, info = letterbox_image(img, 100, stride=64, training=True)
    # destination rounded up to 128
    assert out.shape == (128, 128, 3)


def test_letterbox_downscale():
    img = np.zeros((1280, 960, 3), dtype=np.uint8)
    out, info = letterbox_image(img, 640, stride=32, training=True)
    assert out.shape == (640, 640, 3)
    assert abs(info.scale - 0.5) < 1e-6


def test_letterbox_test_mode_minimal_pad():
    img = np.zeros((300, 640, 3), dtype=np.uint8)
    out, info = letterbox_image(img, 640, stride=32, training=False)
    # scaled to (300, 640); pad height to next /32 -> 320
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert out.shape[0] < 640  # minimal padding, not full 640


def test_letterbox_box_roundtrip():
    rng = np.random.default_rng(3)
    img = np.zeros((480, 640, 3), dtype=np.uint8)
    _, info = letterbox_image(img, 640, stride=32, training=True)
    xy = rng.uniform(0, 300, size=(20, 2))
    wh = rng.uniform(10, 100, size=(20, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    fwd = letterbox_boxes(boxes, info)
    back = unletterbox_boxes_np(fwd, info)
    np.testing.assert_allclose(back, boxes, rtol=1e-4, atol=1e-2)


def test_letterbox_fill_value():
    img = np.zeros((320, 640, 3), dtype=np.uint8)
    out, info = letterbox_image(img, 640, stride=32, fill_value=114, training=True)
    assert (out[0] == 114).all()  # top padding row
