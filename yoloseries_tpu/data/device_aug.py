"""Device-side training augmentation: the host PLANS, the TPU RENDERS.

Motivation (round-3 dress rehearsal, measured): the reference pipeline does
all augmentation pixel work on the host with cv2 (utils/data_aug.py — the
whole mosaic/mixup/perspective/HSV chain), which binds training throughput
to host cores. On a 1-core host the 640px loader sustains ~18 img/s while
the chip's train step eats >700 img/s — a 40x input-bound stall that no
worker-count tuning can fix.

The TPU-native split: keep ONLY cheap O(#boxes) work on the host and move
every O(#pixels) op onto the device as one batched jitted program:

* host planner (`plan_sample`): draws the SAME rng stream as the host
  pipeline (`YOLODataset.get`), does the mosaic placement arithmetic, the
  warp-matrix sampling, the box transforms/filters and the resample loop —
  producing per-sample uint8 tiles plus a small parameter record. Labels
  are bit-identical to the host pipeline by construction (same numpy code
  on the same draws).
* device renderer (`render_batch`): for every output pixel, composes
  letterbox-inverse -> flips -> cutout test -> warp (M^-1, cv2 fixed-point
  quantization) -> mosaic-tile resolve -> bilinear gather of the two mixup
  layers -> blend -> cutout paint -> HSV jitter, all as ONE fused XLA
  computation on static shapes. cv2's multi-pass pipeline (full 2s x 2s
  mosaic canvas in memory, then warp, then LUTs) collapses into a single
  inverse-mapped gather: no canvas is ever materialized.

Pixel parity vs the cv2 pipeline is approximate (bilinear fixed-point and
HSV integer rounding differ at the last bit; mixup blends after sampling
instead of before — linearity makes that <=1 LSB), verified to tight
tolerances in tests/test_device_aug.py. Box/label output is exact.

Every reference augmentation knob renders on device. blur and
scale_jitting go through the STAGED renderer (plane -> blur -> jit +
letterbox, see `render_staged`), which needs the sample plane to fit the
input-size buffer: perspective_p == 1.0 (the reference default) or mosaic
off. For the remaining combination (blur/jit active + perspective_p < 1 +
mosaic on) the DataLoader falls back to host augmentation with a warning
(`device_aug_supported` is the gate).

Reference equivalents: utils/data_aug.py:579-671 (mosaic), :709-734
(mixup), :482-576 (perspective), :363-389 (HSV), :434-478 (flips),
:737-798 (cutout).
"""

from __future__ import annotations

import numpy as np

from .augment import (
    AugmentConfig,
    perspective_boxes,
    sample_perspective_params,
    valid_boxes_mask,
)

__all__ = ["plan_sample", "render_batch", "render_method", "render_staged",
           "repack_tiles", "device_aug_supported", "N_TILES", "N_CUTOUT"]

N_TILES = 8  # 4 mosaic-A + 4 mosaic-B (mixup); single-image plans use tile 0
N_CUTOUT = 31  # cutout mask budget: len([.5] + [.25]*2 + [.125]*4 + ...)

_CUTOUT_SCALES = [0.5] + [0.25] * 2 + [0.125] * 4 + [0.0625] * 8 + [0.03125] * 16


def device_aug_supported(cfg: AugmentConfig) -> bool:
    """True when every active knob has a device renderer path.

    blur / scale_jitting need the STAGED renderer (they don't commute
    with the nearest letterbox), which materializes the sample plane at
    input size — so they additionally require the plane to fit the tile
    buffer: every sample warped (perspective_p == 1.0, the reference
    default) or mosaic off (no 2x canvas plane)."""
    if cfg.blur_p == 0.0 and cfg.scale_jitting_p == 0.0:
        return True
    return cfg.perspective_p >= 1.0 or cfg.mosaic_p == 0.0


def render_staged(cfg: AugmentConfig) -> bool:
    """Whether render_batch needs the staged path for this config."""
    return cfg.blur_p > 0.0 or cfg.scale_jitting_p > 0.0


def render_method(cfg: AugmentConfig) -> str:
    """Renderer strategy for this config.

    'separable' — the warp matrix is diagonal-affine (no rotation, shear
    or perspective), so canvas x depends only on output column and canvas
    y only on output row: every pixel access becomes a per-axis gather
    (rows, then columns) that the TPU executes as large contiguous DMAs.
    This is the fast path; measured ~2 orders of magnitude over 'gather'.

    'gather' — general projective warps mix x and y per pixel and need a
    flat per-pixel gather. Correct everywhere, but TPUs have no per-lane
    gather so XLA serializes it: use `data_aug_prespective: 0.0` (and
    degrees/shear 0 — already the reference defaults,
    config/train_yolov5.yaml) to unlock the separable path.
    """
    diag = cfg.degrees == 0.0 and cfg.shear == 0.0 and cfg.perspective == 0.0
    return "separable" if diag else "gather"


def _empty_plan(th, tw, with_pixels=True):
    plan = {
        "rects": np.zeros((N_TILES, 4), np.float32),
        "minv": np.eye(3, dtype=np.float32),
        "mix": np.float32(1.0),
        "hsv": np.ones((3,), np.float32),
        "flips": np.zeros((2,), np.float32),
        "plane_wh": np.zeros((2,), np.float32),
        "cut_rects": np.zeros((N_CUTOUT, 4), np.float32),
        "cut_colors": np.zeros((N_CUTOUT, 3), np.float32),
        "cut_on": np.zeros((N_CUTOUT,), np.float32),
        # staged-path knobs (blur / scale_jitting), zero when inactive
        "blur_on": np.float32(0.0),
        "jit_on": np.float32(0.0),
        "jit": np.float32(1.0),
        "jit_flip": np.float32(0.0),
        "jit_off": np.zeros((2,), np.float32),
    }
    if with_pixels:
        plan["tiles"] = np.zeros((N_TILES, th, tw, 3), np.uint8)
    else:
        # device-cache plan: pixels stay in the chip-resident dataset
        # cache; only indices + storage origins cross the host boundary
        plan["img_ids"] = np.zeros((N_TILES,), np.int32)
        plan["tile_off"] = np.zeros((N_TILES, 2), np.float32)
        plan["_tile_hw"] = (th, tw)
    return plan


def _place_tile(plan, t, img, crop, rect, xc, yc, img_id=-1):
    """Place the image crop `crop` (xyxy, image coords) of `img` into tile
    t with HALF-ALIGNED storage: left-half tiles are right-aligned (local
    x = canvas x + tw - xc), top-half tiles bottom-aligned (local y =
    canvas y + th - yc), right/bottom halves left/top-aligned (local =
    canvas - xc/yc). The canvas->local offset is then a per-half constant
    derivable from rects alone — which is what lets the separable renderer
    fetch columns with a row-invariant index.

    Two plan modes share this placement math:
    * pixel plans ("tiles" present): copy the crop's pixels now;
    * device-cache plans ("img_ids"): record only (img_id, image coords of
      storage origin) — the repack/gather happens in HBM from the
      device-resident dataset cache (repack_tiles)."""
    if "tiles" in plan:
        th, tw = plan["tiles"].shape[1:3]
    else:
        th, tw = plan["_tile_hw"]
    xo1, yo1, xo2, yo2 = rect
    xi1, yi1 = crop[0], crop[1]
    xs0 = xo1 + (tw - xc if xo2 <= xc else -xc)
    ys0 = yo1 + (th - yc if yo2 <= yc else -yc)
    plan["rects"][t] = rect
    if "tiles" in plan:
        plan["tiles"][t, ys0:ys0 + (yo2 - yo1), xs0:xs0 + (xo2 - xo1)] = \
            img[yi1:yi1 + (yo2 - yo1), xi1:xi1 + (xo2 - xo1)]
    else:
        plan["img_ids"][t] = img_id
        # image coords of storage origin: row j holds image row j + iy0
        plan["tile_off"][t] = (xi1 - xs0, yi1 - ys0)


def _plan_mosaic(dataset, idx, rng, plan, layer):
    """Mirror of YOLODataset._mosaic + augment.mosaic4: identical rng draws
    and box arithmetic (data/augment.py mosaic4), but instead of painting a
    (2h, 2w) canvas it records, per tile, the crop placed into the plan's
    tile buffer (half-aligned, see _place_tile) and its canvas rect."""
    indices = [idx] + [int(rng.integers(0, len(dataset))) for _ in range(3)]
    rng.shuffle(indices)
    if "tiles" in plan:
        pulled = [
            (img, img.shape[:2], b, l)
            for img, b, l in (dataset.pull_item(i) for i in indices)
        ]
    else:
        # device-cache plan: pixels never leave the chip-resident cache, so
        # don't page them through the host memmap either (pull_meta is
        # shapes+labels only — ~8 MB/plan of memcpy saved at 640px)
        pulled = [(None, *dataset.pull_meta(i)) for i in indices]

    mh, mw = (2 * s for s in dataset.input_size)
    yc = int(rng.uniform(2 * mh / 5, 4 * mh / 5))
    xc = int(rng.uniform(2 * mw / 5, 4 * mw / 5))
    boxes_out, labels_out = [], []
    t0 = 4 * layer

    th, tw = dataset.input_size  # == the tile buffer shape
    for i, (img, (h, w), boxes, labels) in enumerate(pulled):
        if h > th or w > tw:
            raise ValueError(
                f"device_aug needs images that fit the tile buffer "
                f"({th}x{tw}); got {h}x{w}. Enable cache_images=True "
                "(min-scale resize) or pre-size the dataset."
            )
        if i == 0:
            xo1, yo1, xo2, yo2 = max(xc - w, 0), max(yc - h, 0), xc, yc
        elif i == 1:
            xo1, yo1, xo2, yo2 = xc, max(yc - h, 0), min(xc + w, mw), yc
        elif i == 2:
            xo1, yo1, xo2, yo2 = max(xc - w, 0), yc, xc, min(yc + h, mh)
        else:
            xo1, yo1, xo2, yo2 = xc, yc, min(xc + w, mw), min(yc + h, mh)

        cx, cy = w // 2, h // 2
        wi, hi = xo2 - xo1, yo2 - yo1
        dxi, dyi = wi // 2, hi // 2
        xi1, yi1 = cx - dxi, cy - dyi
        xi2, yi2 = cx + (wi - dxi), cy + (hi - dyi)

        _place_tile(plan, t0 + i, img, (xi1, yi1, xi2, yi2),
                    (xo1, yo1, xo2, yo2), xc, yc, img_id=indices[i])

        boxes = np.round(np.asarray(boxes, np.float32), 3)
        labels = np.asarray(labels)
        if len(boxes) == 0:
            continue
        # keep boxes overlapping the crop rect: IoU > 0 iff iw > 0 and
        # ih > 0 (pairwise_iou_np's denominator is clipped positive) —
        # interval tests avoid the generic (M, 1) IoU machinery, which was
        # ~16% of plan time (4+ calls per mosaic on tiny arrays)
        keep = (
            (np.minimum(boxes[:, 2], xi2) - np.maximum(boxes[:, 0], xi1) > 0)
            & (np.minimum(boxes[:, 3], yi2) - np.maximum(boxes[:, 1], yi1) > 0)
        )
        if keep.sum() == 0:
            continue
        bk = boxes[keep]
        b = bk.copy()
        orig_area = (bk[:, 2] - bk[:, 0]) * (bk[:, 3] - bk[:, 1])
        # np.clip == minimum(maximum(...)) for float arrays; the direct
        # ufunc pair skips the fromnumeric dispatch layer
        b[:, [0, 2]] = np.minimum(
            np.maximum(np.round(b[:, [0, 2]], 2), xi1), xi2 - 1
        ) - xi1 + xo1
        b[:, [1, 3]] = np.minimum(
            np.maximum(np.round(b[:, [1, 3]], 2), yi1), yi2 - 1
        ) - yi1 + yo1
        cur_area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        retention = np.round(cur_area / orig_area, 1)
        valid = retention >= 0.3
        boxes_out.append(b[valid])
        labels_out.append(labels[keep][valid])

    if boxes_out:
        boxes = np.clip(np.concatenate(boxes_out, axis=0), 0, mh)
        labels = np.concatenate(labels_out, axis=0)
        return (mh, mw), boxes, labels, True
    # degenerate (mosaic4:120-121): fall back to the first pulled tile as a
    # single-image plane (treated as a top-left tile with xc=w, yc=h)
    img, (h, w), boxes, labels = pulled[0]
    if "tiles" in plan:
        plan["tiles"][t0:t0 + 4] = 0
    plan["rects"][t0:t0 + 4] = 0.0
    _place_tile(plan, t0, img, (0, 0, w, h), (0, 0, w, h), w, h,
                img_id=indices[0])
    return (h, w), np.asarray(boxes), np.asarray(labels), False


def _plan_chain(plan, boxes, labels, plane_hw, cfg: AugmentConfig, rng):
    """Mirror of augment.apply_transform_chain minus the pixel work:
    perspective -> cutout -> HSV -> (blur draw) -> flips -> (jit draw)."""
    h0, w0 = plane_hw

    # --- random_perspective (augment.py:random_perspective)
    if rng.random() < cfg.perspective_p:
        height, width = cfg.input_size
        M, s = sample_perspective_params((h0, w0), cfg, rng, (height, width))
        boxes, labels = perspective_boxes(
            M, s, boxes, labels, width, height, bool(cfg.perspective)
        )
        plan["minv"] = np.linalg.inv(M).astype(np.float32)
        plane_hw = (height, width)
    h, w = plane_hw
    plan["plane_wh"] = np.asarray([w, h], np.float32)

    # --- cutout (augment.py:cutout): record rects/colors; sequential paint
    # order is preserved by the renderer (later mask wins)
    if rng.random() < cfg.cutout_p:
        keep_mask = np.ones(len(boxes), dtype=bool)
        painted_any = False
        m = 0
        for s_ in _CUTOUT_SCALES:
            mh = int(rng.integers(1, max(int(h * s_), 2)))
            mw = int(rng.integers(1, max(int(w * s_), 2)))
            xc, yc = int(rng.integers(0, w)), int(rng.integers(0, h))
            # scalar min/max == np.clip here; np.clip on scalars was ~10%
            # of plan time (64 calls/plan)
            x1 = max(0, min(xc - mw // 2, w))
            y1 = max(0, min(yc - mh // 2, h))
            x2 = max(0, min(xc + mw // 2, w))
            y2 = max(0, min(yc + mh // 2, h))
            mask_area = max((x2 - x1) * (y2 - y1), 0)
            if len(boxes):
                bw = np.maximum(boxes[:, 2] - boxes[:, 0], 0)
                bh = np.maximum(boxes[:, 3] - boxes[:, 1], 0)
                iw = np.minimum(np.maximum(
                    np.minimum(boxes[:, 2], x2) - np.maximum(boxes[:, 0], x1),
                    0), w)
                ih = np.minimum(np.maximum(
                    np.minimum(boxes[:, 3], y2) - np.maximum(boxes[:, 1], y1),
                    0), h)
                inter = iw * ih
                iou = inter / (mask_area + bw * bh - inter + 1e-16)
                bad = iou > cfg.cutout_iou_thr
                if bad.all():
                    continue
                keep_mask &= ~bad
            color = [rng.integers(69, 200) for _ in range(3)]
            plan["cut_rects"][m] = (x1, y1, x2, y2)
            plan["cut_colors"][m] = color
            plan["cut_on"][m] = 1.0
            m += 1
            painted_any = True
        if painted_any and keep_mask.sum() > 0:
            boxes, labels = boxes[keep_mask], labels[keep_mask]
        elif painted_any:
            # reference keeps the UNCUT image when every box would die
            plan["cut_on"][:] = 0.0

    # --- HSV (augment.py:random_hsv)
    if rng.random() < cfg.hsv_p:
        r = rng.uniform(-1, 1, 3) * [cfg.hsv_hgain, cfg.hsv_sgain, cfg.hsv_vgain] + 1
        plan["hsv"] = r.astype(np.float32)

    # --- blur (augment.py:random_blur): 5x5 mean, rendered by _blur5
    if rng.random() < cfg.blur_p:
        plan["blur_on"] = np.float32(1.0)

    # --- flips (augment.py:random_flip_lr/ud)
    if rng.random() < cfg.fliplr_p:
        plan["flips"][0] = 1.0
        if len(boxes):
            out = boxes.copy()
            out[:, 0] = w - boxes[:, 2]
            out[:, 2] = w - boxes[:, 0]
            boxes = out
    if rng.random() < cfg.flipud_p:
        plan["flips"][1] = 1.0
        if len(boxes):
            out = boxes.copy()
            out[:, 1] = h - boxes[:, 3]
            out[:, 3] = h - boxes[:, 1]
            boxes = out

    # --- scale jitting (augment.py:scale_jitting, dst_size == plane):
    # identical draws + box math; pixels rendered by the staged path
    if rng.random() < cfg.scale_jitting_p:
        jflip = rng.random() > 0.5
        scale = 1.0  # min(h/h, w/w): dst_size is the plane itself
        base = 1.0
        jit = base + (rng.uniform(0.5, 1.5) if scale < 1.0
                      else rng.uniform(0.0, 0.5))
        rh, rw = int(h * jit), int(w * jit)
        y_off = int(rng.integers(0, rh - h)) if rh > h else 0
        x_off = int(rng.integers(0, rw - w)) if rw > w else 0
        b = boxes.copy() * jit
        if len(b) and jflip:
            x1 = rw - b[:, 2].copy()
            x2 = rw - b[:, 0].copy()
            b[:, 0], b[:, 2] = x1, x2
        if len(b):
            b[:, [0, 2]] = np.minimum(np.maximum(b[:, [0, 2]] - x_off, 0), w)
            b[:, [1, 3]] = np.minimum(np.maximum(b[:, [1, 3]] - y_off, 0), h)
            ws = b[:, 2] - b[:, 0] + 1e-16
            hs = b[:, 3] - b[:, 1] + 1e-16
            ar = np.maximum(ws / hs, hs / ws)
            keep = (ar < 20) & (ws >= 3) & (hs >= 3)
        else:
            keep = np.zeros((0,), dtype=bool)
        if keep.sum() > 0:
            boxes, labels = b[keep], labels[keep]
            plan["jit_on"] = np.float32(1.0)
            plan["jit"] = np.float32(jit)
            plan["jit_flip"] = np.float32(jflip)
            plan["jit_off"] = np.asarray([x_off, y_off], np.float32)
        # else: reference keeps the unjitted image and boxes

    return plan, boxes, labels, plane_hw


def plan_sample(dataset, idx: int, rng: np.random.Generator,
                with_pixels: bool = True):
    """One augmented-sample PLAN: rng-draw-compatible with
    YOLODataset.get(..., enable_aug=True) so boxes/labels are identical to
    the host pipeline; pixels are rendered later by render_batch.

    with_pixels=False produces a device-cache plan: no pixel bytes at all
    (img_ids + storage origins instead of tiles) for rendering against a
    chip-resident dataset cache (requires dataset cache_images so cached
    shapes are known and ids index the cache).

    Returns (plan dict, boxes (N,4) xyxy in the sample plane, labels (N,),
    plane_hw) — the sample plane is what the host pipeline would have
    passed to collate (warped (s,s) image, unwarped mosaic canvas, or the
    raw image).
    """
    th, tw = dataset.input_size

    for _attempt in range(10):
        plan = _empty_plan(th, tw, with_pixels)
        if with_pixels:
            img, boxes, labels = dataset.pull_item(idx)
            plane_hw = img.shape[:2]
        else:
            img = None
            plane_hw, boxes, labels = dataset.pull_meta(idx)
        if rng.random() < dataset.aug.mosaic_p:
            plane_hw, boxes, labels, ok = _plan_mosaic(dataset, idx, rng, plan, 0)
            if rng.random() < dataset.aug.mixup_p:
                idx2 = int(rng.integers(0, len(dataset)))
                plane2, b2, l2, ok2 = _plan_mosaic(dataset, idx2, rng, plan, 1)
                ratio = float(rng.beta(8.0, 8.0))
                if ok and ok2:  # reference mixup has both canvases 2s x 2s
                    plan["mix"] = np.float32(ratio)
                    boxes = np.concatenate([boxes, b2], axis=0)
                    labels = np.concatenate([labels, l2], axis=0)
                # degenerate mosaic planes can differ in size — skip the
                # blend (host path would crash here; unreachable with any
                # real dataset, guarded for safety)
        else:
            h, w = plane_hw
            if h > th or w > tw:
                raise ValueError(
                    "device_aug needs images that fit the tile buffer "
                    f"({th}x{tw}); got {h}x{w}. Enable cache_images=True "
                    "(min-scale resize) or pre-size the dataset."
                )
            _place_tile(plan, 0, img, (0, 0, w, h), (0, 0, w, h), w, h,
                        img_id=idx)

        plan, boxes, labels, plane_hw = _plan_chain(
            plan, np.asarray(boxes, np.float32), np.asarray(labels),
            plane_hw, dataset.aug, rng,
        )

        if len(boxes):
            keep = valid_boxes_mask(boxes)
            boxes, labels = boxes[keep], labels[keep]
        if len(boxes) and boxes.sum() > 0:
            plan.pop("_tile_hw", None)
            return plan, boxes.astype(np.float32), labels.astype(np.float32), plane_hw
        idx = int(rng.integers(0, len(dataset)))

    # give up augmenting (dataset.get:227-229): raw item as a 1-tile plan
    plan = _empty_plan(th, tw, with_pixels)
    if with_pixels:
        img, boxes, labels = dataset.pull_item(idx)
        h, w = img.shape[:2]
    else:
        img = None
        (h, w), boxes, labels = dataset.pull_meta(idx)
    _place_tile(plan, 0, img, (0, 0, w, h), (0, 0, w, h), w, h, img_id=idx)
    plan["plane_wh"] = np.asarray([w, h], np.float32)
    plan.pop("_tile_hw", None)
    return plan, boxes.astype(np.float32), labels.astype(np.float32), (h, w)


# --------------------------------------------------------------------------
# device renderer
# --------------------------------------------------------------------------


def _rgb_to_hsv_u8(rgb):
    """cv2 COLOR_RGB2HSV uint8 convention: H in [0,180), S,V in [0,255]."""
    import jax.numpy as jnp

    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    s = jnp.where(v > 0, jnp.round(255.0 * diff / jnp.maximum(v, 1e-9)), 0.0)
    safe = jnp.maximum(diff, 1e-9)
    h = jnp.where(
        v == r, 60.0 * (g - b) / safe,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                  240.0 + 60.0 * (r - g) / safe),
    )
    h = jnp.where(diff == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h)
    return jnp.round(h / 2.0), s, v


def _hsv_to_rgb_u8(h, s, v):
    """Inverse of cv2's uint8 HSV: h in [0,180), s,v in [0,255]."""
    import jax.numpy as jnp

    h = h * 2.0  # degrees
    c = v * (s / 255.0)
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    i = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [c, x, z, z, x, c])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [x, c, c, x, z, z])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [z, z, x, c, c, x])
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def _halved(rects, field, right, bottom):
    """Select a per-tile scalar (rects[:, t, field]) by quadrant masks.
    right/bottom broadcast against the output lattice; returns their
    broadcast shape. Mosaic tiles are 2x2: t = right + 2*bottom."""
    import jax.numpy as jnp

    r = rects[..., field]  # (B, 4)

    def bc(t):
        return r[:, t].reshape(r.shape[0], *([1] * (right.ndim - 1)))

    return jnp.where(
        bottom,
        jnp.where(right, bc(3), bc(2)),
        jnp.where(right, bc(1), bc(0)),
    )


def _sample_layer(tiles_flat, rects, u, v, th, tw, fill):
    """Bilinear sample of one mosaic layer at continuous canvas coords
    (u, v) — the GENERAL (projective-warp) path: 4 taps, each resolved to
    its covering tile with one flat per-pixel gather. Uncovered canvas is
    `fill` (identical to cv2 sampling the fill-initialized canvas). cv2
    warp quantizes source coords to 1/32 (INTER_BITS=5); replicated.

    Tile resolve is arithmetic, not mask+argmax: the 2x2 mosaic split
    (xc, yc) = rects[:, 0, 2:4] decides the quadrant, the quadrant's rect
    bounds decide coverage, and half-aligned storage (_place_tile) makes
    the canvas->local offset a per-half constant.

    tiles_flat: (B, 4*th*tw, 3) uint8;  rects: (B, 4, 4)
    u, v: (B, H, W) f32. Returns (B, H, W, 3) f32.
    """
    import jax.numpy as jnp

    u = jnp.round(u * 32.0) / 32.0
    v = jnp.round(v * 32.0) / 32.0
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0

    b = tiles_flat.shape[0]
    xc = rects[:, 0, 2].reshape(b, *([1] * (u.ndim - 1)))
    yc = rects[:, 0, 3].reshape(b, *([1] * (u.ndim - 1)))

    out = 0.0
    for du, dv, wgt in (
        (0.0, 0.0, (1 - fu) * (1 - fv)),
        (1.0, 0.0, fu * (1 - fv)),
        (0.0, 1.0, (1 - fu) * fv),
        (1.0, 1.0, fu * fv),
    ):
        uu = u0 + du  # integer-valued canvas coords, f32
        vv = v0 + dv
        right = uu >= xc
        bottom = vv >= yc
        hit = (
            (_halved(rects, 0, right, bottom) <= uu)
            & (uu < _halved(rects, 2, right, bottom))
            & (_halved(rects, 1, right, bottom) <= vv)
            & (vv < _halved(rects, 3, right, bottom))
        )
        lx = jnp.clip(uu + jnp.where(right, -xc, tw - xc), 0, tw - 1)
        ly = jnp.clip(vv + jnp.where(bottom, -yc, th - yc), 0, th - 1)
        tile_id = right.astype(jnp.int32) + 2 * bottom.astype(jnp.int32)
        flat = ((tile_id * th + ly.astype(jnp.int32)) * tw
                + lx.astype(jnp.int32))  # (B, H, W)
        tap = jnp.take_along_axis(
            tiles_flat, flat.reshape(b, -1, 1), axis=1
        ).reshape(*flat.shape, 3).astype(jnp.float32)
        tap = jnp.where(hit[..., None], tap, fill)
        out = out + wgt[..., None] * tap
    return out


def _sample_layer_separable(tiles, rects, u, v, th, tw, fill):
    """Bilinear sample of one mosaic layer when the warp is diagonal-
    affine: canvas x depends only on the output column (u: (B, W)) and
    canvas y only on the row (v: (B, H)). Every memory access is then an
    AXIS gather — whole tile rows per (b, row-tap), whole columns per
    (b, col-tap) — which XLA lowers to large contiguous DMAs instead of
    the per-pixel gathers TPUs can't vectorize. Same tap/weight/coverage
    arithmetic as _sample_layer (cv2 1/32 quantization included), so the
    two paths agree to f32 rounding.

    tiles: (B, 4, th, tw, 3) uint8 half-aligned (_place_tile);
    rects: (B, 4, 4). Returns (B, H, W, 3) f32.
    """
    import jax.numpy as jnp

    b = tiles.shape[0]
    stacked = tiles.reshape(b, 4 * th, tw, 3)

    u = jnp.round(u * 32.0) / 32.0  # (B, W)
    v = jnp.round(v * 32.0) / 32.0  # (B, H)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    xc = rects[:, 0, 2:3]  # (B, 1)
    yc = rects[:, 0, 3:4]

    val = 0.0
    cov = 0.0
    for dv, wv in ((0.0, 1 - fv), (1.0, fv)):  # row taps, (B, H)
        vv = v0 + dv
        bottom = vv >= yc  # (B, H)
        ly = jnp.clip(vv + jnp.where(bottom, -yc, th - yc), 0, th - 1)
        bot_i = bottom.astype(jnp.int32)
        # rows of the left-half and right-half tile for this row tap
        half_rows = []
        hity = []
        for hx in (0, 1):
            row_idx = (hx + 2 * bot_i) * th + ly.astype(jnp.int32)  # (B, H)
            half_rows.append(jnp.take_along_axis(
                stacked, row_idx[:, :, None, None], axis=1))  # (B,H,tw,3) u8
            ylo = jnp.where(bottom, rects[:, 2 + hx, 1:2], rects[:, hx, 1:2])
            yhi = jnp.where(bottom, rects[:, 2 + hx, 3:4], rects[:, hx, 3:4])
            hity.append((ylo <= vv) & (vv < yhi))  # (B, H)
        cat = jnp.concatenate(half_rows, axis=2)  # (B, H, 2*tw, 3)

        for du, wu in ((0.0, 1 - fu), (1.0, fu)):  # column taps, (B, W)
            uu = u0 + du
            right = uu >= xc  # (B, W)
            lx = jnp.clip(uu + jnp.where(right, -xc, tw - xc), 0, tw - 1)
            col_idx = (right.astype(jnp.int32) * tw
                       + lx.astype(jnp.int32))  # (B, W): row-invariant
            pix = jnp.take_along_axis(
                cat, col_idx[:, None, :, None], axis=2
            ).astype(jnp.float32)  # (B, H, W, 3)
            # x-bounds of the selected tile: depend on the row half too
            rightN = right[:, None, :]  # (B, 1, W)
            bottomN = bottom[:, :, None]  # (B, H, 1)
            xlo = _halved(rects, 0, rightN, bottomN)
            xhi = _halved(rects, 2, rightN, bottomN)
            hitx = (xlo <= uu[:, None, :]) & (uu[:, None, :] < xhi)
            hity_sel = jnp.where(rightN, hity[1][:, :, None],
                                 hity[0][:, :, None])
            wgt = (wv[:, :, None] * wu[:, None, :]
                   * (hitx & hity_sel).astype(jnp.float32))  # (B, H, W)
            val = val + wgt[..., None] * pix
            cov = cov + wgt
    return val + fill * (1.0 - cov)[..., None]


def repack_tiles(cache, img_ids, tile_off):
    """Materialize the half-aligned (B, 8, th, tw, 3) tile buffer in HBM
    from the device-resident dataset cache — two axis gathers (whole rows,
    then row-invariant columns), no host bytes involved.

    cache: (N, th, tw, 3) uint8 (the min-scale-resized image cache,
    DetectionDataset cache_images). img_ids: (B, 8) int32.
    tile_off: (B, 8, 2) f32 — image coords (x, y) of storage origin, so
    storage pixel (j, k) of tile t holds cache[id, j + y0, k + x0].
    Out-of-crop storage positions read clipped in-image pixels; the
    renderer's rect-hit test guarantees they are never sampled.
    """
    import jax.numpy as jnp

    n, th, tw, _ = cache.shape
    b = img_ids.shape[0]
    flat = cache.reshape(n * th, tw, 3)
    iy0 = tile_off[..., 1].astype(jnp.int32)  # (B, 8)
    ix0 = tile_off[..., 0].astype(jnp.int32)
    rows = jnp.clip(iy0[..., None] + jnp.arange(th), 0, th - 1)  # (B,8,th)
    ridx = img_ids[..., None] * th + rows
    g = jnp.take(flat, ridx.reshape(-1), axis=0).reshape(b, N_TILES, th,
                                                         tw, 3)
    cols = jnp.clip(ix0[..., None] + jnp.arange(tw), 0, tw - 1)  # (B,8,tw)
    return jnp.take_along_axis(g, cols[:, :, None, :, None], axis=3)


_render_jit = {}


def render_batch(tiles, plan, out_hw, tile_hw, fill=114, lb_fill=114,
                 method="gather", cache=None, staged=False):
    """Jitted entry (lazy: loader worker processes import this module for
    plan_sample and must not pull jax into a forked interpreter).

    method: 'gather' (general projective warps) or 'separable' (fast axis-
    gather path, valid when degrees==shear==perspective==0 — use
    `render_method(cfg)` to pick).

    staged: render the plane first, then blur / scale_jitting / letterbox
    stages — required when blur_p or scale_jitting_p is active (use
    `render_staged(cfg)`).

    cache: device-resident (N, th, tw, 3) uint8 dataset cache. When given,
    `tiles` is ignored (pass None) and the plan must carry img_ids +
    tile_off (plan_sample with_pixels=False): the tile buffer is repacked
    in HBM and only plan scalars cross the host boundary."""
    global _render_jit
    import jax

    mode = "cache" if cache is not None else "tiles"
    if mode not in _render_jit:
        if mode == "cache":
            def _cached(cache, plan, out_hw, tile_hw, fill, lb_fill, method,
                        staged):
                tiles = repack_tiles(cache, plan["img_ids"],
                                     plan["tile_off"])
                return _render_batch(tiles, plan, out_hw, tile_hw, fill,
                                     lb_fill, method, staged)

            _render_jit[mode] = jax.jit(
                _cached, static_argnames=("out_hw", "tile_hw", "fill",
                                          "lb_fill", "method", "staged"),
            )
        else:
            _render_jit[mode] = jax.jit(
                _render_batch, static_argnames=("out_hw", "tile_hw", "fill",
                                                "lb_fill", "method",
                                                "staged"),
            )
    first = cache if mode == "cache" else tiles
    return _render_jit[mode](first, plan, out_hw=out_hw, tile_hw=tile_hw,
                             fill=fill, lb_fill=lb_fill, method=method,
                             staged=staged)


def _warp_and_sample(tiles, plan, fx, fy, th, tw, fill, method):
    """Mosaic+mixup plane value at plane coords fx ((B|1),1,W) /
    fy ((B|1),H,1): warp through M^-1, sample both layers, blend, round.
    Returns (B, H, W, 3) f32."""
    import jax.numpy as jnp

    b = tiles.shape[0]
    minv = plan["minv"]
    if method == "separable":
        # diagonal-affine: u is a per-column function, v per-row
        u = minv[:, 0, 0][:, None] * fx[:, 0, :] + minv[:, 0, 2][:, None]
        v = minv[:, 1, 1][:, None] * fy[:, :, 0] + minv[:, 1, 2][:, None]
        layers = [
            _sample_layer_separable(tiles[:, 4 * i:4 * i + 4],
                                    plan["rects"][:, 4 * i:4 * i + 4],
                                    u, v, th, tw, float(fill))
            for i in (0, 1)
        ]
    else:
        u = minv[:, 0, 0][:, None, None] * fx \
            + minv[:, 0, 1][:, None, None] * fy \
            + minv[:, 0, 2][:, None, None]
        v = minv[:, 1, 0][:, None, None] * fx \
            + minv[:, 1, 1][:, None, None] * fy \
            + minv[:, 1, 2][:, None, None]
        w_ = minv[:, 2, 0][:, None, None] * fx \
            + minv[:, 2, 1][:, None, None] * fy \
            + minv[:, 2, 2][:, None, None]
        u = u / w_
        v = v / w_
        tiles_flat = tiles.reshape(b, N_TILES * th * tw, 3)
        layers = [
            _sample_layer(tiles_flat[:, 4 * i * th * tw:
                                     (4 * i + 4) * th * tw],
                          plan["rects"][:, 4 * i:4 * i + 4],
                          u, v, th, tw, float(fill))
            for i in (0, 1)
        ]

    # two mixup layers, blended post-sample (linear in pixel values)
    ratio = plan["mix"][:, None, None, None]
    return jnp.round(ratio * layers[0] + (1.0 - ratio) * layers[1])


def _pointwise_chain(val, plan, fx, fy):
    """Cutout paint + HSV jitter at plane coords fx/fy (broadcastable to
    (B, H, W)) — pointwise, so it commutes with the nearest letterbox."""
    import jax.numpy as jnp

    # cutout paint (sample-plane coords, sequential: later mask wins)
    cr = plan["cut_rects"]
    con = plan["cut_on"]
    cc = plan["cut_colors"]
    for m in range(N_CUTOUT):
        hit = (
            (con[:, m][:, None, None] > 0)
            & (cr[:, m, 0][:, None, None] <= fx) & (fx < cr[:, m, 2][:, None, None])
            & (cr[:, m, 1][:, None, None] <= fy) & (fy < cr[:, m, 3][:, None, None])
        )
        val = jnp.where(hit[..., None], cc[:, m][:, None, None, :], val)

    # HSV jitter (cv2 LUT semantics: trunc after gain, hue mod 180)
    r = plan["hsv"]
    hsv_on = jnp.any(r != 1.0, axis=1)[:, None, None]
    h, s, vch = _rgb_to_hsv_u8(val)
    h2 = jnp.floor(jnp.mod(h * r[:, 0][:, None, None], 180.0))
    s2 = jnp.floor(jnp.clip(s * r[:, 1][:, None, None], 0, 255))
    v2 = jnp.floor(jnp.clip(vch * r[:, 2][:, None, None], 0, 255))
    rgb2 = jnp.round(_hsv_to_rgb_u8(h2, s2, v2))
    return jnp.where(hsv_on[..., None], rgb2, val)


def _blur5(plane, plan):
    """5x5 normalized box filter (augment.py random_blur -> cv2.blur):
    BORDER_REFLECT_101 at the per-sample plane edge via index arithmetic,
    floor(sum/25 + 0.5) rounding (verified bit-exact vs cv2). Separable:
    5 row gathers then 5 row-invariant column gathers. Applied where the
    plan's blur draw fired."""
    import jax.numpy as jnp

    b, th, tw, _ = plane.shape
    pw = plan["plane_wh"][:, 0:1]  # (B, 1)
    ph = plan["plane_wh"][:, 1:2]

    def refl(i, n):
        period = jnp.maximum(2.0 * n - 2.0, 1.0)
        j = jnp.mod(jnp.abs(i), period)
        return jnp.where(j > n - 1, period - j, j)

    y = jnp.arange(th, dtype=jnp.float32)[None, :]
    x = jnp.arange(tw, dtype=jnp.float32)[None, :]
    acc = 0.0
    for dy in range(-2, 3):
        iy = refl(y + dy, ph).astype(jnp.int32)
        acc = acc + jnp.take_along_axis(plane, iy[:, :, None, None], axis=1)
    acc2 = 0.0
    for dx in range(-2, 3):
        ix = refl(x + dx, pw).astype(jnp.int32)
        acc2 = acc2 + jnp.take_along_axis(acc, ix[:, None, :, None], axis=2)
    blurred = jnp.floor(acc2 / 25.0 + 0.5)
    on = plan["blur_on"][:, None, None, None] > 0
    return jnp.where(on, blurred, plane)


def _stage_b(plane, plan, out_hw, lb_fill):
    """Letterbox(nearest) <- scale_jitting(bilinear crop, augment.py
    :scale_jitting) <- flips, composed into per-axis coordinate maps over
    the rendered plane: 2 row gathers + 2 row-invariant column gathers.
    cv2.resize INTER_LINEAR convention src=(dst+0.5)/s-0.5 with clamped
    edges (within +/-1 of cv2's fixed-point, measured)."""
    import jax.numpy as jnp

    b, th, tw, _ = plane.shape
    oh, ow = out_hw
    scale = plan["lbox"][:, 0:1]
    padl = plan["lbox"][:, 1:2]
    padt = plan["lbox"][:, 2:3]
    pw = plan["plane_wh"][:, 0:1]
    ph = plan["plane_wh"][:, 1:2]
    jon = plan["jit_on"][:, None]
    jit = plan["jit"][:, None]
    jfl = plan["jit_flip"][:, None]
    jx = plan["jit_off"][:, 0:1]
    jy = plan["jit_off"][:, 1:2]

    def axis_coords(D, pad, n, joff, size_is_w):
        """dst index -> (tap0, tap1, frac, valid) in true-plane coords."""
        d = jnp.arange(D, dtype=jnp.float32)[None, :]
        i = jnp.floor((d - pad) / scale)  # letterbox-inverse, nearest
        valid = (i >= 0) & (i < n)
        i = jnp.clip(i, 0, n - 1)
        # scale_jitting inverse: crop offset, optional mirror in resized
        # coords, then the resize's source mapping. cv2.resize uses the
        # ACTUAL size ratio n/r (r truncated to int), not 1/jit — the
        # ~0.5% difference is a visible subpixel drift
        r = jnp.floor(n * jit)  # resized extent
        c = i + joff
        if size_is_w:  # the jitting mirror is horizontal-only
            c = jnp.where(jfl > 0, r - 1.0 - c, c)
        u = jnp.clip((c + 0.5) * (n / r) - 0.5, 0, n - 1)
        u = jnp.where(jon > 0, u, i)
        t0 = jnp.floor(u)
        f = u - t0
        t1 = jnp.minimum(t0 + 1.0, n - 1)
        # normal flips happened BEFORE jitting: mirror taps last
        fl = plan["flips"][:, 0:1] if size_is_w else plan["flips"][:, 1:2]
        t0 = jnp.where(fl > 0, n - 1 - t0, t0)
        t1 = jnp.where(fl > 0, n - 1 - t1, t1)
        return t0.astype(jnp.int32), t1.astype(jnp.int32), f, valid

    y0, y1, fy, vy = axis_coords(oh, padt, ph, jy, False)  # (B, H)
    x0, x1, fx, vx = axis_coords(ow, padl, pw, jx, True)   # (B, W)

    rows = (
        jnp.take_along_axis(plane, y0[:, :, None, None], axis=1)
        * (1.0 - fy)[:, :, None, None]
        + jnp.take_along_axis(plane, y1[:, :, None, None], axis=1)
        * fy[:, :, None, None]
    )  # (B, H, tw, 3)
    val = (
        jnp.take_along_axis(rows, x0[:, None, :, None], axis=2)
        * (1.0 - fx)[:, None, :, None]
        + jnp.take_along_axis(rows, x1[:, None, :, None], axis=2)
        * fx[:, None, :, None]
    )  # (B, H, W, 3)
    val = jnp.round(val)  # the host path's resize emits uint8

    valid = vy[:, :, None] & vx[:, None, :]
    out = jnp.where(valid[..., None], val, float(lb_fill))
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def _render_batch(tiles, plan, out_hw, tile_hw, fill=114, lb_fill=114,
                  method="gather", staged=False):
    """Render a batch of augmentation plans to (B, H, W, 3) uint8 on device.

    Pointwise mode (staged=False — no blur/scale_jitting): per output
    pixel, the exact host chain composed in inverse: letterbox (per-
    sample scale/pad, INTER_NEAREST) <- flips <- [cutout, HSV applied
    forward] <- warp M^-1 <- mosaic tile gather + mixup blend. Only dst
    pixels are ever computed.

    Staged mode (blur_p / scale_jitting_p active): blur and the jitting
    resample do not commute with the nearest letterbox, so the plane is
    materialized at tile_hw first — stage A (warp+sample+cutout+HSV at
    identity coords) -> _blur5 -> _stage_b (jit+flips+letterbox as
    per-axis gathers). Requires the plane to fit tile_hw: perspective_p
    must be 1.0 (every sample warped to input size) or mosaic off.

    plan fields (all batched): minv (B,3,3), rects (B,8,4), mix (B,),
    hsv (B,3), flips (B,2), plane_wh (B,2), lbox (B,3)
    [scale, pad_left, pad_top], cut_rects (B,31,4), cut_colors (B,31,3),
    cut_on (B,31), blur_on (B,), jit_on/jit/jit_flip (B,), jit_off (B,2).
    """
    import jax.numpy as jnp

    oh, ow = out_hw
    th, tw = tile_hw

    if staged:
        x = jnp.arange(tw, dtype=jnp.float32)[None, None, :]
        y = jnp.arange(th, dtype=jnp.float32)[None, :, None]
        val = _warp_and_sample(tiles, plan, x, y, th, tw, fill, method)
        val = _pointwise_chain(val, plan, x, y)
        val = _blur5(val, plan)
        return _stage_b(val, plan, out_hw, lb_fill)

    x = jnp.arange(ow, dtype=jnp.float32)[None, None, :]
    y = jnp.arange(oh, dtype=jnp.float32)[None, :, None]

    scale = plan["lbox"][:, 0][:, None, None]
    padl = plan["lbox"][:, 1][:, None, None]
    padt = plan["lbox"][:, 2][:, None, None]
    pw = plan["plane_wh"][:, 0][:, None, None]
    ph = plan["plane_wh"][:, 1][:, None, None]

    # letterbox inverse: INTER_NEAREST source index floor(dst/scale).
    # xi/fx depend only on (sample, column) and yi/fy only on (sample,
    # row) — kept as (B,1,W)/(B,H,1) so the separable path stays per-axis.
    xi = jnp.floor((x - padl) / scale)
    yi = jnp.floor((y - padt) / scale)
    valid = (xi >= 0) & (xi < pw) & (yi >= 0) & (yi < ph)
    xi = jnp.clip(xi, 0, pw - 1)
    yi = jnp.clip(yi, 0, ph - 1)

    # flips (sample-plane mirror)
    flip_lr = plan["flips"][:, 0][:, None, None]
    flip_ud = plan["flips"][:, 1][:, None, None]
    fx = jnp.where(flip_lr > 0, pw - 1 - xi, xi)  # (B, 1, W)
    fy = jnp.where(flip_ud > 0, ph - 1 - yi, yi)  # (B, H, 1)

    val = _warp_and_sample(tiles, plan, fx, fy, th, tw, fill, method)
    val = _pointwise_chain(val, plan, fx, fy)
    out = jnp.where(valid[..., None], val, float(lb_fill))
    return jnp.clip(out, 0, 255).astype(jnp.uint8)
