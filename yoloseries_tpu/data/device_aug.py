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

Unsupported knobs fall back to the host pipeline (DataLoader refuses
device_aug): blur_p > 0, scale_jitting_p > 0 (dead defaults in every
reference preset, config/train_yolov5.yaml data_hyp).

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

__all__ = ["plan_sample", "render_batch", "device_aug_supported", "N_TILES",
           "N_CUTOUT"]

N_TILES = 8  # 4 mosaic-A + 4 mosaic-B (mixup); single-image plans use tile 0
N_CUTOUT = 31  # cutout mask budget: len([.5] + [.25]*2 + [.125]*4 + ...)

_CUTOUT_SCALES = [0.5] + [0.25] * 2 + [0.125] * 4 + [0.0625] * 8 + [0.03125] * 16


def device_aug_supported(cfg: AugmentConfig) -> bool:
    """True when every active knob has a device renderer path."""
    return cfg.blur_p == 0.0 and cfg.scale_jitting_p == 0.0


def _empty_plan(th, tw):
    return {
        "tiles": np.zeros((N_TILES, th, tw, 3), np.uint8),
        "rects": np.zeros((N_TILES, 4), np.float32),
        "offs": np.zeros((N_TILES, 2), np.float32),
        "minv": np.eye(3, dtype=np.float32),
        "mix": np.float32(1.0),
        "hsv": np.ones((3,), np.float32),
        "flips": np.zeros((2,), np.float32),
        "plane_wh": np.zeros((2,), np.float32),
        "cut_rects": np.zeros((N_CUTOUT, 4), np.float32),
        "cut_colors": np.zeros((N_CUTOUT, 3), np.float32),
        "cut_on": np.zeros((N_CUTOUT,), np.float32),
    }


def _plan_mosaic(dataset, idx, rng, plan, layer):
    """Mirror of YOLODataset._mosaic + augment.mosaic4: identical rng draws
    and box arithmetic (data/augment.py mosaic4), but instead of painting a
    (2h, 2w) canvas it records, per tile, the crop placed into the plan's
    tile buffer, its canvas rect and the canvas->tile offset."""
    from ..ops.metrics import pairwise_iou_np

    indices = [idx] + [int(rng.integers(0, len(dataset))) for _ in range(3)]
    rng.shuffle(indices)
    pulled = [dataset.pull_item(i) for i in indices]

    mh, mw = (2 * s for s in dataset.input_size)
    yc = int(rng.uniform(2 * mh / 5, 4 * mh / 5))
    xc = int(rng.uniform(2 * mw / 5, 4 * mw / 5))
    boxes_out, labels_out = [], []
    t0 = 4 * layer

    th, tw = plan["tiles"].shape[1:3]
    for i, (img, boxes, labels) in enumerate(pulled):
        h, w = img.shape[:2]
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

        # the whole image is the tile; the crop origin folds into the
        # canvas->tile offset (the rect bounds what the renderer samples)
        t = t0 + i
        plan["tiles"][t, :h, :w] = img
        plan["rects"][t] = (xo1, yo1, xo2, yo2)
        plan["offs"][t] = (xi1 - xo1, yi1 - yo1)  # local = canvas + off

        boxes = np.round(np.asarray(boxes, np.float32), 3)
        labels = np.asarray(labels)
        if len(boxes) == 0:
            continue
        crop = np.array([[xi1, yi1, xi2, yi2]], dtype=np.float32)
        keep = pairwise_iou_np(boxes, crop).squeeze(axis=1) > 0
        if keep.sum() == 0:
            continue
        b = boxes[keep].copy()
        orig_area = np.prod(boxes[keep][:, 2:4] - boxes[keep][:, 0:2], axis=1)
        b[:, [0, 2]] = np.clip(np.round(b[:, [0, 2]], 2), xi1, xi2 - 1) - xi1 + xo1
        b[:, [1, 3]] = np.clip(np.round(b[:, [1, 3]], 2), yi1, yi2 - 1) - yi1 + yo1
        cur_area = np.prod(b[:, 2:4] - b[:, 0:2], axis=1)
        retention = np.round(cur_area / orig_area, 1)
        valid = retention >= 0.3
        boxes_out.append(b[valid])
        labels_out.append(labels[keep][valid])

    if boxes_out:
        boxes = np.clip(np.concatenate(boxes_out, axis=0), 0, mh)
        labels = np.concatenate(labels_out, axis=0)
        return (mh, mw), boxes, labels, True
    # degenerate (mosaic4:120-121): fall back to the first pulled tile as a
    # single-image plane
    img, boxes, labels = pulled[0]
    plan["tiles"][t0:t0 + 4] = 0
    plan["rects"][t0:t0 + 4] = 0.0
    h, w = img.shape[:2]
    plan["tiles"][t0, :h, :w] = img
    plan["rects"][t0] = (0.0, 0.0, w, h)
    plan["offs"][t0] = (0.0, 0.0)
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
            mh = rng.integers(1, max(int(h * s_), 2))
            mw = rng.integers(1, max(int(w * s_), 2))
            xc, yc = rng.integers(0, w), rng.integers(0, h)
            x1 = np.clip(xc - mw // 2, 0, w)
            y1 = np.clip(yc - mh // 2, 0, h)
            x2 = np.clip(xc + mw // 2, 0, w)
            y2 = np.clip(yc + mh // 2, 0, h)
            mask_area = max((x2 - x1) * (y2 - y1), 0)
            if len(boxes):
                bw = np.maximum(boxes[:, 2] - boxes[:, 0], 0)
                bh = np.maximum(boxes[:, 3] - boxes[:, 1], 0)
                iw = np.clip(np.minimum(boxes[:, 2], x2) - np.maximum(boxes[:, 0], x1), 0, w)
                ih = np.clip(np.minimum(boxes[:, 3], y2) - np.maximum(boxes[:, 1], y1), 0, h)
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

    # --- blur draw (gated off by device_aug_supported, draw still consumed)
    rng.random()

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

    # --- scale jitting draw (gated off, draw consumed)
    rng.random()

    return plan, boxes, labels, plane_hw


def plan_sample(dataset, idx: int, rng: np.random.Generator):
    """One augmented-sample PLAN: rng-draw-compatible with
    YOLODataset.get(..., enable_aug=True) so boxes/labels are identical to
    the host pipeline; pixels are rendered later by render_batch.

    Returns (plan dict, boxes (N,4) xyxy in the sample plane, labels (N,),
    plane_hw) — the sample plane is what the host pipeline would have
    passed to collate (warped (s,s) image, unwarped mosaic canvas, or the
    raw image).
    """
    th, tw = dataset.input_size

    for _attempt in range(10):
        plan = _empty_plan(th, tw)
        img, boxes, labels = dataset.pull_item(idx)
        plane_hw = img.shape[:2]
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
            h, w = img.shape[:2]
            if h > th or w > tw:
                raise ValueError(
                    "device_aug needs images that fit the tile buffer "
                    f"({th}x{tw}); got {h}x{w}. Enable cache_images=True "
                    "(min-scale resize) or pre-size the dataset."
                )
            plan["tiles"][0, :h, :w] = img
            plan["rects"][0] = (0.0, 0.0, w, h)

        plan, boxes, labels, plane_hw = _plan_chain(
            plan, np.asarray(boxes, np.float32), np.asarray(labels),
            plane_hw, dataset.aug, rng,
        )

        if len(boxes):
            keep = valid_boxes_mask(boxes)
            boxes, labels = boxes[keep], labels[keep]
        if len(boxes) and boxes.sum() > 0:
            return plan, boxes.astype(np.float32), labels.astype(np.float32), plane_hw
        idx = int(rng.integers(0, len(dataset)))

    # give up augmenting (dataset.get:227-229): raw item as a 1-tile plan
    plan = _empty_plan(th, tw)
    img, boxes, labels = dataset.pull_item(idx)
    h, w = img.shape[:2]
    plan["tiles"][0, :h, :w] = img
    plan["rects"][0] = (0.0, 0.0, w, h)
    plan["plane_wh"] = np.asarray([w, h], np.float32)
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


def _sample_layer(tiles_flat, rects, offs, u, v, th, tw, fill):
    """Bilinear sample of one mosaic layer at continuous canvas coords
    (u, v): 4 taps, each resolved to its covering tile (mosaic regions are
    disjoint canvas rects; uncovered canvas is `fill` — identical to cv2
    sampling the fill-initialized canvas). cv2 warp quantizes source coords
    to 1/32 (INTER_BITS=5); replicated for parity.

    tiles_flat: (B, 4*th*tw, 3) f32;  rects: (B, 4, 4);  offs: (B, 4, 2)
    u, v: (B, H, W) f32. Returns (B, H, W, 3) f32.
    """
    import jax.numpy as jnp

    u = jnp.round(u * 32.0) / 32.0
    v = jnp.round(v * 32.0) / 32.0
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0

    out = 0.0
    for du, dv, wgt in (
        (0.0, 0.0, (1 - fu) * (1 - fv)),
        (1.0, 0.0, fu * (1 - fv)),
        (0.0, 1.0, (1 - fu) * fv),
        (1.0, 1.0, fu * fv),
    ):
        uu = u0 + du  # integer-valued canvas coords, f32
        vv = v0 + dv
        # which of the 4 tiles covers this tap? rects are disjoint
        hit = (
            (rects[:, :, None, None, 0] <= uu[:, None])
            & (uu[:, None] < rects[:, :, None, None, 2])
            & (rects[:, :, None, None, 1] <= vv[:, None])
            & (vv[:, None] < rects[:, :, None, None, 3])
        )  # (B, 4, H, W)
        any_hit = jnp.any(hit, axis=1)
        tile_id = jnp.argmax(hit, axis=1)  # (B, H, W)
        offx = jnp.take_along_axis(
            offs[:, :, 0], tile_id.reshape(tile_id.shape[0], -1), axis=1
        ).reshape(tile_id.shape)
        offy = jnp.take_along_axis(
            offs[:, :, 1], tile_id.reshape(tile_id.shape[0], -1), axis=1
        ).reshape(tile_id.shape)
        lx = jnp.clip(uu + offx, 0, tw - 1).astype(jnp.int32)
        ly = jnp.clip(vv + offy, 0, th - 1).astype(jnp.int32)
        flat = (tile_id * th + ly) * tw + lx  # (B, H, W)
        tap = jnp.take_along_axis(
            tiles_flat, flat.reshape(flat.shape[0], -1, 1), axis=1
        ).reshape(*flat.shape, 3)
        tap = jnp.where(any_hit[..., None], tap, fill)
        out = out + wgt[..., None] * tap
    return out


_render_jit = None


def render_batch(tiles, plan, out_hw, tile_hw, fill=114, lb_fill=114):
    """Jitted entry (lazy: loader worker processes import this module for
    plan_sample and must not pull jax into a forked interpreter)."""
    global _render_jit
    if _render_jit is None:
        import jax

        _render_jit = jax.jit(
            _render_batch, static_argnames=("out_hw", "tile_hw", "fill",
                                            "lb_fill"),
        )
    return _render_jit(tiles, plan, out_hw=out_hw, tile_hw=tile_hw,
                       fill=fill, lb_fill=lb_fill)


def _render_batch(tiles, plan, out_hw, tile_hw, fill=114, lb_fill=114):
    """Render a batch of augmentation plans to (B, H, W, 3) uint8 on device.

    Per output pixel, composing the exact host chain in inverse:
    letterbox (per-sample scale/pad, INTER_NEAREST) <- flips <- [cutout,
    HSV applied forward] <- warp M^-1 <- mosaic tile gather + mixup blend.

    plan fields (all batched): minv (B,3,3), rects (B,8,4), offs (B,8,2),
    mix (B,), hsv (B,3), flips (B,2), plane_wh (B,2), lbox (B,3)
    [scale, pad_left, pad_top], cut_rects (B,31,4), cut_colors (B,31,3),
    cut_on (B,31).
    """
    import jax.numpy as jnp

    oh, ow = out_hw
    th, tw = tile_hw
    b = tiles.shape[0]
    tiles_f = tiles.astype(jnp.float32).reshape(b, N_TILES * th * tw, 3)

    x = jnp.arange(ow, dtype=jnp.float32)[None, None, :]
    y = jnp.arange(oh, dtype=jnp.float32)[None, :, None]

    scale = plan["lbox"][:, 0][:, None, None]
    padl = plan["lbox"][:, 1][:, None, None]
    padt = plan["lbox"][:, 2][:, None, None]
    pw = plan["plane_wh"][:, 0][:, None, None]
    ph = plan["plane_wh"][:, 1][:, None, None]

    # letterbox inverse: INTER_NEAREST source index floor(dst/scale)
    xi = jnp.floor((x - padl) / scale)
    yi = jnp.floor((y - padt) / scale)
    valid = (xi >= 0) & (xi < pw) & (yi >= 0) & (yi < ph)
    xi = jnp.clip(xi, 0, pw - 1)
    yi = jnp.clip(yi, 0, ph - 1)

    # flips (sample-plane mirror)
    flip_lr = plan["flips"][:, 0][:, None, None]
    flip_ud = plan["flips"][:, 1][:, None, None]
    fx = jnp.where(flip_lr > 0, pw - 1 - xi, xi)
    fy = jnp.where(flip_ud > 0, ph - 1 - yi, yi)

    # warp to mosaic-canvas coords (perspective-general)
    minv = plan["minv"]
    u = minv[:, 0, 0][:, None, None] * fx + minv[:, 0, 1][:, None, None] * fy \
        + minv[:, 0, 2][:, None, None]
    v = minv[:, 1, 0][:, None, None] * fx + minv[:, 1, 1][:, None, None] * fy \
        + minv[:, 1, 2][:, None, None]
    w_ = minv[:, 2, 0][:, None, None] * fx + minv[:, 2, 1][:, None, None] * fy \
        + minv[:, 2, 2][:, None, None]
    u = u / w_
    v = v / w_

    # two mixup layers, blended post-sample (linear in pixel values)
    a = _sample_layer(tiles_f[:, : 4 * th * tw], plan["rects"][:, :4],
                      plan["offs"][:, :4], u, v, th, tw, float(fill))
    bl = _sample_layer(tiles_f[:, 4 * th * tw:], plan["rects"][:, 4:],
                       plan["offs"][:, 4:], u, v, th, tw, float(fill))
    ratio = plan["mix"][:, None, None, None]
    val = ratio * a + (1.0 - ratio) * bl
    val = jnp.round(val)

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
    val = jnp.where(hsv_on[..., None], rgb2, val)

    out = jnp.where(valid[..., None], val, float(lb_fill))
    return jnp.clip(out, 0, 255).astype(jnp.uint8)
