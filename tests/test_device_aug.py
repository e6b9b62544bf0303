"""Device-side augmentation: planner/renderer parity with the host cv2
pipeline (data/device_aug.py).

* labels are EXACT: the planner consumes the identical rng stream and runs
  the identical numpy box math as YOLODataset.get, so boxes/labels match
  bit for bit,
* pixels are approximate: cv2's fixed-point bilinear (1/32 quantization,
  replicated) and integer HSV rounding differ in the last bits; mixup
  blends post-sample instead of pre-warp (linear => <=1 LSB). Bounds below
  were set from measured distributions, with headroom.
"""

import numpy as np
import pytest
from PIL import Image

from yoloseries_tpu.data import AugmentConfig, DataLoader, DetectionDataset
from yoloseries_tpu.data.device_aug import (
    device_aug_supported,
    plan_sample,
    render_batch,
)
from yoloseries_tpu.ops.letterbox import letterbox_image

SIZE = (128, 128)


@pytest.fixture(scope="module")
def aug_dataset(tmp_path_factory):
    """10 images <= input_size with 2-3 rectangles each (device_aug needs
    tiles that fit the buffer — the cache_images path guarantees that in
    production; here the images are simply generated small)."""
    root = tmp_path_factory.mktemp("dev_aug_ds")
    img_dir, lab_dir = root / "img", root / "lab"
    img_dir.mkdir()
    lab_dir.mkdir()
    rng = np.random.default_rng(5)
    for i in range(10):
        h = int(rng.integers(80, SIZE[0] + 1))
        w = int(rng.integers(80, SIZE[1] + 1))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        lines = []
        for _ in range(int(rng.integers(2, 4))):
            x1 = int(rng.integers(0, w - 40))
            y1 = int(rng.integers(0, h - 40))
            x2 = x1 + int(rng.integers(20, 40))
            y2 = y1 + int(rng.integers(20, 40))
            cls = int(rng.integers(0, 3))
            img[y1:y2, x1:x2] = [220, 40 + 60 * cls, 30]
            lines.append(f"{cls} {x1} {y1} {x2} {y2}")
        Image.fromarray(img).save(img_dir / f"{i:06d}.jpg")
        (lab_dir / f"{i:06d}.txt").write_text("\n".join(lines) + "\n")
    names = root / "names.txt"
    names.write_text("0 a\n1 b\n2 c\n")
    return img_dir, lab_dir, names


def _make_ds(aug_dataset, **aug_overrides):
    img_dir, lab_dir, names = aug_dataset
    aug = AugmentConfig(input_size=SIZE, **aug_overrides)
    return DetectionDataset(img_dir, lab_dir, names, input_size=SIZE, aug=aug)


FULL_AUG = dict(mosaic_p=1.0, mixup_p=0.5, perspective_p=1.0, hsv_p=1.0,
                fliplr_p=0.5, flipud_p=0.5, cutout_p=0.5)


@pytest.mark.parametrize("overrides", [
    FULL_AUG,
    dict(mosaic_p=0.0, perspective_p=1.0, hsv_p=1.0, cutout_p=1.0),
    dict(mosaic_p=1.0, mixup_p=0.0, perspective_p=0.0, hsv_p=0.0,
         fliplr_p=1.0, cutout_p=0.0),
    dict(mosaic_p=1.0, mixup_p=0.5, perspective_p=1.0, hsv_p=1.0,
         fliplr_p=0.5, blur_p=0.7, scale_jitting_p=0.7),
], ids=["full", "no_mosaic", "mosaic_only_flip", "blur_jit"])
def test_plan_labels_match_host(aug_dataset, overrides):
    """plan_sample consumes the same rng draws and box math as get()."""
    ds = _make_ds(aug_dataset, **overrides)
    assert device_aug_supported(ds.aug)
    for idx in range(len(ds)):
        for seed in (0, 1, 2):
            img, hb, hl = ds.get(idx, np.random.default_rng((seed, idx)))
            plan, pb, pl, plane_hw = plan_sample(
                ds, idx, np.random.default_rng((seed, idx)))
            assert plane_hw == img.shape[:2], (idx, seed)
            np.testing.assert_array_equal(hb, pb, err_msg=f"{idx}/{seed}")
            np.testing.assert_array_equal(hl, pl)


# diagonal-affine warp (degrees=shear=perspective=0, the reference
# train-preset defaults apart from the 5e-4 perspective jitter): unlocks
# the separable axis-gather renderer
SEP_AUG = dict(mosaic_p=1.0, mixup_p=0.5, perspective_p=1.0, perspective=0.0,
               hsv_p=1.0, fliplr_p=0.5, flipud_p=0.5, cutout_p=0.5)


def _render_plans(ds, n, seed, method, staged=False):
    plans, host_imgs = [], []
    for idx in range(n):
        img, hb, hl = ds.get(idx, np.random.default_rng((seed, idx)))
        plan, pb, pl, plane_hw = plan_sample(
            ds, idx, np.random.default_rng((seed, idx)))
        host, info = letterbox_image(img, SIZE, stride=32, fill_value=114,
                                     training=True)
        plan["lbox"] = np.asarray(
            [info.scale, info.pad_left, info.pad_top], np.float32)
        plans.append(plan)
        host_imgs.append(host)

    batch_plan = {k: np.stack([p[k] for p in plans]) for k in plans[0]}
    tiles = batch_plan.pop("tiles")
    out = np.asarray(render_batch(tiles, batch_plan, out_hw=SIZE,
                                  tile_hw=SIZE, method=method,
                                  staged=staged))
    return out, np.stack(host_imgs)


@pytest.mark.parametrize("overrides,max_bad_frac,method", [
    (dict(mosaic_p=1.0, mixup_p=0.0, perspective_p=0.0, hsv_p=0.0,
          fliplr_p=0.5, flipud_p=0.5, cutout_p=0.5), 0.0, "gather"),
    (dict(mosaic_p=1.0, mixup_p=0.0, perspective_p=0.0, hsv_p=0.0,
          fliplr_p=0.5, flipud_p=0.5, cutout_p=0.5), 0.0, "separable"),
    # measured on this fixture: mean |diff| 0.61, frac>2 = 2.8%, max 17
    # (hue-wrap pixels: integer HSV rounding compounds with the warp's
    # last-bit bilinear differences); bound set with headroom
    (FULL_AUG, 0.05, "gather"),
    (SEP_AUG, 0.05, "separable"),
], ids=["exact_path", "exact_path_sep", "full_chain", "full_chain_sep"])
def test_render_matches_host_pixels(aug_dataset, overrides, max_bad_frac,
                                    method):
    """Rendered pixels vs the cv2 pipeline + letterbox. Pure copy/flip/
    cutout plans are exact; warp/HSV/mixup paths differ only in last-bit
    rounding: >=95% of pixels within +/-2 and mean |diff| < 1."""
    ds = _make_ds(aug_dataset, **overrides)
    out, host = _render_plans(ds, 6, 7, method)
    diff = np.abs(out.astype(np.int32) - host.astype(np.int32))
    bad_frac = float((diff > 2).mean())
    assert bad_frac <= max_bad_frac, (bad_frac, float(diff.mean()))
    assert float(diff.mean()) < 1.0


@pytest.mark.parametrize("overrides,method", [
    (dict(FULL_AUG, blur_p=1.0), "gather"),
    (dict(SEP_AUG, scale_jitting_p=1.0), "separable"),
    (dict(SEP_AUG, blur_p=0.7, scale_jitting_p=0.7), "separable"),
], ids=["blur", "jit_sep", "blur_jit_sep"])
def test_staged_render_matches_host_pixels(aug_dataset, overrides, method):
    """blur / scale_jitting force the staged renderer (plane -> blur ->
    jit+letterbox stages); same parity bounds vs the cv2 host chain."""
    ds = _make_ds(aug_dataset, **overrides)
    out, host = _render_plans(ds, 6, 7, method, staged=True)
    diff = np.abs(out.astype(np.int32) - host.astype(np.int32))
    assert float((diff > 2).mean()) <= 0.05, (float((diff > 2).mean()),
                                              float(diff.mean()))
    assert float(diff.mean()) < 1.0


def test_staged_equals_pointwise_without_blur_jit(aug_dataset):
    """With blur/jit off the staged decomposition must reproduce the
    pointwise renderer to <=1 LSB (the stages are algebraically the same
    chain, split at the plane)."""
    ds = _make_ds(aug_dataset, **SEP_AUG)
    out_p, _ = _render_plans(ds, 6, 19, "separable")
    out_s, _ = _render_plans(ds, 6, 19, "separable", staged=True)
    diff = np.abs(out_p.astype(np.int32) - out_s.astype(np.int32))
    assert float(diff.max()) <= 1, float(diff.max())
    assert float((diff > 0).mean()) < 0.01


def test_separable_equals_gather(aug_dataset):
    """On diagonal-affine plans the two renderers share tap/weight math
    and must agree to f32 rounding (<=1 uint8 LSB after the round)."""
    ds = _make_ds(aug_dataset, **SEP_AUG)
    out_g, _ = _render_plans(ds, 6, 13, "gather")
    out_s, _ = _render_plans(ds, 6, 13, "separable")
    diff = np.abs(out_g.astype(np.int32) - out_s.astype(np.int32))
    assert float(diff.max()) <= 1, (float(diff.max()), float((diff > 0).mean()))
    assert float((diff > 0).mean()) < 0.01


def test_loader_device_aug_end_to_end(aug_dataset):
    """DataLoader(device_aug=True) emits plan batches; render produces the
    final images; annotations match the host-pipeline loader exactly."""
    ds = _make_ds(aug_dataset, **FULL_AUG)
    common = dict(batch_size=4, max_labels=20, seed=11, workers=2,
                  shuffle=False, infinite=True, use_processes=False)
    host_loader = DataLoader(ds, **common)
    plan_loader = DataLoader(ds, device_aug=True, **common)
    try:
        hb = next(iter(host_loader))
        pb = next(iter(plan_loader))
        np.testing.assert_array_equal(hb["ann"], pb["ann"])
        np.testing.assert_array_equal(hb["info"], pb["info"])
        out = np.asarray(render_batch(pb["tiles"], pb["plan"], out_hw=SIZE,
                                      tile_hw=SIZE))
        assert out.shape == hb["img"].shape and out.dtype == np.uint8
        diff = np.abs(out.astype(np.int32) - hb["img"].astype(np.int32))
        assert float((diff > 2).mean()) <= 0.05
        # no-aug tail falls back to pixel batches
        plan_loader.close_data_aug()
        nb = None
        for _ in range(12):  # drain plan batches buffered before the switch
            nb = next(iter(plan_loader))
            if "img" in nb:
                break
        assert nb is not None and "img" in nb
    finally:
        host_loader.stop()
        plan_loader.stop()


def test_device_aug_falls_back_unsupported(aug_dataset):
    # blur with a PARTIAL warp probability and mosaic on: unwarped mosaic
    # samples live on the 2x canvas, which the staged plane can't hold —
    # contract (device_aug.py docstring): warn and fall back to host aug
    ds = _make_ds(aug_dataset, blur_p=0.5, perspective_p=0.5, mosaic_p=1.0)
    with pytest.warns(UserWarning, match="falling back to host"):
        loader = DataLoader(ds, batch_size=2, workers=1, use_processes=False,
                            device_aug=True, device_cache=True)
    try:
        assert not loader.device_aug and not loader.device_cache
        batch = next(iter(loader))
        assert "img" in batch  # host-collated pixels, not a plan batch
    finally:
        loader.stop()


def test_device_aug_cache_resizes_oversized(aug_dataset, tmp_path):
    """Images larger than input_size work through cache_images' min-scale
    resize (TrainConfig forces the cache on whenever device_aug is set —
    regression: the 640px A/B rehearsal failed on 690px raw images)."""
    img_dir, lab_dir, names = aug_dataset
    aug = AugmentConfig(input_size=(64, 64), **FULL_AUG)
    ds = DetectionDataset(img_dir, lab_dir, names, input_size=(64, 64),
                          aug=aug, cache_images=True, cache_dir=tmp_path)
    plan, boxes, labels, plane_hw = plan_sample(
        ds, 0, np.random.default_rng(0))
    assert plan["tiles"].shape[1:3] == (64, 64)
    assert len(boxes) == 0 or boxes.max() <= 2 * 64
    # warm start reads the sidecar (no image decodes) and agrees
    ds2 = DetectionDataset(img_dir, lab_dir, names, input_size=(64, 64),
                           aug=aug, cache_images=True, cache_dir=tmp_path)
    np.testing.assert_array_equal(ds._orig_shapes, ds2._orig_shapes)
    np.testing.assert_array_equal(ds._cache_shapes, ds2._cache_shapes)

    from yoloseries_tpu.configs import TrainConfig

    assert TrainConfig.from_hyp({"device_aug": True}, num_class=3).cache_images


def test_device_cache_render_matches_tiles(aug_dataset, tmp_path):
    """with_pixels=False plans (indices + storage origins only) rendered
    against the device-resident cache are BIT-IDENTICAL to pixel-tile
    plans: the placement math is shared, repack_tiles just replays it in
    HBM. This is the zero-host-bytes input path."""
    import jax.numpy as jnp

    from yoloseries_tpu.data.device_aug import repack_tiles

    img_dir, lab_dir, names = aug_dataset
    aug = AugmentConfig(input_size=SIZE, **SEP_AUG)
    ds = DetectionDataset(img_dir, lab_dir, names, input_size=SIZE,
                          aug=aug, cache_images=True, cache_dir=tmp_path)
    cache = jnp.asarray(np.asarray(ds._cache))

    plans_t, plans_c = [], []
    for idx in range(6):
        pt = plan_sample(ds, idx, np.random.default_rng((3, idx)))
        pc = plan_sample(ds, idx, np.random.default_rng((3, idx)),
                         with_pixels=False)
        np.testing.assert_array_equal(pt[1], pc[1])  # boxes
        np.testing.assert_array_equal(pt[0]["rects"], pc[0]["rects"])
        for p in (pt, pc):
            p[0]["lbox"] = np.asarray([1.0, 0.0, 0.0], np.float32)
        plans_t.append(pt[0])
        plans_c.append(pc[0])

    bt = {k: np.stack([p[k] for p in plans_t]) for k in plans_t[0]}
    bc = {k: np.stack([p[k] for p in plans_c]) for k in plans_c[0]}
    tiles = bt.pop("tiles")

    # the repacked buffer equals the host-written one wherever a rect
    # can be sampled; compare the full render output (exact)
    repacked = np.asarray(repack_tiles(cache, jnp.asarray(bc["img_ids"]),
                                       jnp.asarray(bc["tile_off"])))
    assert repacked.shape == tiles.shape

    for method in ("separable", "gather"):
        out_t = np.asarray(render_batch(tiles, bt, out_hw=SIZE,
                                        tile_hw=SIZE, method=method))
        out_c = np.asarray(render_batch(None, bc, out_hw=SIZE,
                                        tile_hw=SIZE, method=method,
                                        cache=cache))
        np.testing.assert_array_equal(out_t, out_c)


def test_loader_device_cache_end_to_end(aug_dataset, tmp_path):
    """DataLoader(device_cache=True) emits pixel-free plan batches whose
    annotations match the pixel-plan loader exactly."""
    img_dir, lab_dir, names = aug_dataset
    aug = AugmentConfig(input_size=SIZE, **SEP_AUG)
    ds = DetectionDataset(img_dir, lab_dir, names, input_size=SIZE,
                          aug=aug, cache_images=True, cache_dir=tmp_path)
    common = dict(batch_size=4, max_labels=20, seed=11, workers=2,
                  shuffle=False, infinite=True, use_processes=False)
    tile_loader = DataLoader(ds, device_aug=True, **common)
    cache_loader = DataLoader(ds, device_aug=True, device_cache=True,
                              **common)
    try:
        tb = next(iter(tile_loader))
        cb = next(iter(cache_loader))
        np.testing.assert_array_equal(tb["ann"], cb["ann"])
        assert "tiles" not in cb and "img_ids" in cb["plan"]
        # pixel-free: the whole per-batch plan payload is tiny
        payload = sum(v.nbytes for v in cb["plan"].values())
        assert payload < 64 * 1024, payload
    finally:
        tile_loader.stop()
        cache_loader.stop()


def test_loader_surfaces_worker_errors(aug_dataset):
    """A worker exception reaches the consumer as a raise, not a silent
    producer exit (which used to hang __next__ forever): plan_sample
    rejects images larger than the tile buffer (input 64 < raw 80-128)."""
    img_dir, lab_dir, names = aug_dataset
    aug = AugmentConfig(input_size=(64, 64), **FULL_AUG)
    ds = DetectionDataset(img_dir, lab_dir, names, input_size=(64, 64),
                          aug=aug)
    loader = DataLoader(ds, batch_size=2, max_labels=20, workers=1,
                        use_processes=False, device_aug=True, infinite=True)
    try:
        with pytest.raises(ValueError, match="tile buffer"):
            next(iter(loader))
    finally:
        loader.stop()


def test_render_batch_sharded_8dev():
    """The renderer under a batch-sharded 8-device mesh (the production
    layout: plans sharded over data, dataset cache replicated) produces
    the same pixels as the unsharded render."""
    from conftest import run_in_clean_subprocess

    run_in_clean_subprocess("""
import numpy as np
import jax, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from yoloseries_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from yoloseries_tpu.data.device_aug import render_batch, repack_tiles, N_TILES

S = 64
rng = np.random.default_rng(0)
B = 8
cache = rng.integers(0, 255, (4, S, S, 3), np.uint8)
plan = {
    "rects": np.zeros((B, N_TILES, 4), np.float32),
    "minv": np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)),
    "mix": np.ones((B,), np.float32),
    "hsv": np.ones((B, 3), np.float32),
    "flips": np.zeros((B, 2), np.float32),
    "plane_wh": np.full((B, 2), S, np.float32),
    "cut_rects": np.zeros((B, 31, 4), np.float32),
    "cut_colors": np.zeros((B, 31, 3), np.float32),
    "cut_on": np.zeros((B, 31), np.float32),
    "blur_on": rng.integers(0, 2, (B,)).astype(np.float32),
    "jit_on": np.zeros((B,), np.float32),
    "jit": np.ones((B,), np.float32),
    "jit_flip": np.zeros((B,), np.float32),
    "jit_off": np.zeros((B, 2), np.float32),
    "img_ids": rng.integers(0, 4, (B, N_TILES)).astype(np.int32),
    "tile_off": np.zeros((B, N_TILES, 2), np.float32),
    "lbox": np.tile(np.asarray([1.0, 0.0, 0.0], np.float32), (B, 1)),
}
plan["rects"][:, 0] = (0, 0, S, S)  # single-tile plans, identity warp

mesh = make_mesh()
assert len(mesh.devices.ravel()) == 8
ref = np.asarray(render_batch(None, plan, out_hw=(S, S), tile_hw=(S, S),
                              method="separable", cache=jnp.asarray(cache),
                              staged=True))
shard = batch_sharding(mesh)
plan_s = {k: jax.device_put(v, shard) for k, v in plan.items()}
cache_s = jax.device_put(cache, replicated(mesh))
out = render_batch(None, plan_s, out_hw=(S, S), tile_hw=(S, S),
                   method="separable", cache=cache_s, staged=True)
assert len(set(d.id for d in out.devices())) == 8
np.testing.assert_array_equal(np.asarray(out), ref)
print("sharded render ok")
""")


@pytest.mark.slow
def test_trainer_device_aug_end_to_end(aug_dataset, tmp_path):
    """`device_aug: true` threads from hyp through Trainer: plan batches
    render on device inside _device_batch and the train step runs."""
    from yoloseries_tpu.configs import TrainConfig
    from yoloseries_tpu.train import Trainer

    img_dir, lab_dir = aug_dataset[0], aug_dataset[1]
    hyp = {
        "device_aug": True,
        # input size must cover the fixture's raw images (<=128): device_aug
        # tiles are input-sized and plan_sample errors on larger images
        "input_img_size": [128, 128], "batch_size": 4, "total_epoch": 1,
        "do_warmup": False, "use_focal_loss": False,
        "data_aug_mosaic_p": 1.0, "data_aug_mixup_p": 0.5,
        "data_aug_prespective_p": 1.0, "data_aug_hsv_p": 1.0,
        "data_aug_cutout_p": 0.0, "data_aug_fliplr_p": 0.5,
        "save_log_txt": False, "num_workers": 2,
    }
    cfg = TrainConfig.from_hyp(
        hyp, num_class=3, model="yolov5s", max_labels=20,
        output_dir=str(tmp_path / "run"), no_aug_epochs=0,
    )
    assert cfg.device_aug
    tr = Trainer(cfg, (img_dir, lab_dir), names_path=aug_dataset[2],
                 log_fn=lambda *a: None)
    try:
        assert tr.train_loader.device_aug
        tr.train(epochs=1)
        assert np.isfinite(tr.meters["tot_loss"].avg)
    finally:
        tr.close()
