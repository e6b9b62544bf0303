"""On-device fused letterbox+normalize vs the host cv2 path: exact match
for every pixel, several src geometries (upscale, downscale, non-square,
1x1 degenerate)."""

import numpy as np
import pytest

from yoloseries_tpu.ops import device_letterbox_normalize, letterbox_plan
from yoloseries_tpu.ops.letterbox import letterbox_image


@pytest.mark.parametrize(
    "src_hw,dst",
    [
        # the 480x640->320 gather is the heaviest compile in the suite;
        # the other four geometries cover the same code path
        pytest.param((480, 640), 320, marks=pytest.mark.slow),
        ((200, 200), 256),    # upscale
        ((331, 517), 192),    # odd sizes
        ((1, 1), 64),         # degenerate 1x1 px image
        ((640, 640), 640),    # identity
    ],
)
def test_device_letterbox_matches_host(src_hw, dst):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (*src_hw, 3), dtype=np.uint8)

    host, info = letterbox_image(img, dst, stride=32, fill_value=114,
                                 training=True)
    dev = np.asarray(
        device_letterbox_normalize(
            img[None], (dst, dst), stride=32, fill_value=114, normalize=False
        )
    )[0].astype(np.uint8)
    assert dev.shape == host.shape
    np.testing.assert_array_equal(dev, host)

    plan = letterbox_plan(src_hw, (dst, dst), stride=32)
    assert plan.scale == info.scale
    assert (plan.pad_top, plan.pad_left) == (info.pad_top, info.pad_left)


def test_device_letterbox_normalized_range():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 255, (2, 123, 77, 3), dtype=np.uint8)
    out = np.asarray(device_letterbox_normalize(img, (64, 64)))
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    # padding frame carries 114/255
    assert np.isclose(out[0, 0, 0, 0], 114 / 255, atol=1e-6)
