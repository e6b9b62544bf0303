"""Fused ON-DEVICE preprocess: letterbox (nearest resize + center pad) +
normalize in one jitted XLA computation (SURVEY §7 step 9 north star).

The reference letterboxes on host with cv2 (utils/data_aug.py:21-70,
interpolation=0 = INTER_NEAREST) and ships f32 to the device. Here the host
ships raw uint8 (B, H0, W0, 3) — 4x less PCIe/ICI traffic — and the device
does nearest-gather + fill-pad + /255 in one fused HBM-bandwidth-bound
kernel feeding the model directly.

Shapes are static per (src, dst) pair, so the gather indices and validity
masks are compile-time constants: XLA fuses the row/col gathers with the
pad-select and the normalize into a single kernel (verified: one fusion in
the compiled HLO). A hand Pallas kernel can't beat it — the op reads
B*H*W*3 uint8 and writes B*H*W*3 f32 with no reuse, so fused XLA already
runs at memory speed-of-light.

Numerics match `letterbox_image` exactly (same scale rule, same cv2
INTER_NEAREST index map sx = floor(dx / scale), same centered padding) so
`LetterboxInfo`/`unletterbox` apply unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .letterbox import LetterboxInfo

__all__ = ["device_letterbox_normalize", "letterbox_plan"]


def letterbox_plan(src_hw, dst_hw, stride: int = 32,
                   only_downscale: bool = False):
    """Static letterbox geometry for a (src, dst) pair — mirrors
    `letterbox_image`'s training-mode arithmetic. Returns LetterboxInfo."""
    src_h, src_w = src_hw
    dst_h, dst_w = dst_hw
    rem_h, rem_w = dst_h % stride, dst_w % stride
    dst_h += (stride - rem_h) if rem_h else 0
    dst_w += (stride - rem_w) if rem_w else 0
    scale = float(min(dst_h / src_h, dst_w / src_w))
    if only_downscale:
        scale = min(scale, 1.0)
    if scale != 1.0:
        new_h, new_w = int(src_h * scale), int(src_w * scale)
    else:
        new_h, new_w = src_h, src_w
    pad_h, pad_w = dst_h - new_h, dst_w - new_w
    top, left = pad_h // 2, pad_w // 2
    return LetterboxInfo(
        scale=scale, pad_top=top, pad_left=left,
        pad_bottom=pad_h - top, pad_right=pad_w - left,
        org_h=src_h, org_w=src_w,
    )


def _nearest_indices(dst_n: int, src_n: int) -> np.ndarray:
    """cv2 INTER_NEAREST source index per destination index:
    sx = floor(dx * src/dst) (cv2 computes the ratio from the actual
    resized extent, not the nominal letterbox scale), clipped."""
    idx = np.floor(
        np.arange(dst_n, dtype=np.float64) * (src_n / dst_n)
    ).astype(np.int64)
    return np.clip(idx, 0, src_n - 1)


@partial(
    jax.jit,
    static_argnames=("dst_hw", "stride", "fill_value", "out_dtype",
                     "normalize", "only_downscale"),
)
def device_letterbox_normalize(
    img_u8,
    dst_hw,
    stride: int = 32,
    fill_value: int = 114,
    out_dtype=jnp.float32,
    normalize: bool = True,
    only_downscale: bool = False,
):
    """uint8 (B, H0, W0, 3) -> (B, H, W, 3) ``out_dtype`` letterboxed
    (+ /255 when ``normalize``), fully on device.

    All geometry is static; use `letterbox_plan(src_hw, dst_hw, stride)` for
    the matching LetterboxInfo to un-letterbox detections.
    """
    b, src_h, src_w, c = img_u8.shape
    info = letterbox_plan((src_h, src_w), dst_hw, stride, only_downscale)
    dst_h = info.pad_top + int(src_h * info.scale if info.scale != 1.0 else src_h) + info.pad_bottom
    dst_w = info.pad_left + int(src_w * info.scale if info.scale != 1.0 else src_w) + info.pad_right
    new_h = dst_h - info.pad_top - info.pad_bottom
    new_w = dst_w - info.pad_left - info.pad_right

    # static gather maps dst row/col -> src row/col; out-of-image dst slots
    # (the padding frame) get clamped indices + are masked to fill_value
    ys = np.arange(dst_h)
    xs = np.arange(dst_w)
    y_in = (ys >= info.pad_top) & (ys < info.pad_top + new_h)
    x_in = (xs >= info.pad_left) & (xs < info.pad_left + new_w)
    iy = np.zeros(dst_h, np.int32)
    iy[y_in] = _nearest_indices(new_h, src_h)
    ix = np.zeros(dst_w, np.int32)
    ix[x_in] = _nearest_indices(new_w, src_w)

    gathered = img_u8[:, jnp.asarray(iy), :, :][:, :, jnp.asarray(ix), :]
    mask = (
        jnp.asarray(y_in)[None, :, None, None]
        & jnp.asarray(x_in)[None, None, :, None]
    )
    out = jnp.where(mask, gathered, jnp.uint8(fill_value)).astype(out_dtype)
    if normalize:
        out = out / jnp.asarray(255.0, out_dtype)
    return out
