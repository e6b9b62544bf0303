"""Letterbox resize (host-side, numpy/cv2) and its inverse for boxes.

Matches the reference `letter_resize_img` (utils/data_aug.py:21-70) including
its quirks that affect mAP parity:

* resize uses ``interpolation=0`` (cv2.INTER_NEAREST),
* stride-rounded destination size,
* training mode pads to the full destination with ``fill_value``,
* test mode pads minimally (remainder mod stride, centered).

The returned ``LetterboxInfo`` mirrors the reference's ``letter_info`` dict and
feeds `unletterbox_boxes` / `letterbox_boxes`.
"""

from __future__ import annotations

from dataclasses import dataclass

import cv2
import numpy as np

__all__ = ["LetterboxInfo", "letterbox_image", "letterbox_boxes", "unletterbox_boxes_np"]


@dataclass(frozen=True)
class LetterboxInfo:
    scale: float
    pad_top: int
    pad_left: int
    pad_bottom: int
    pad_right: int
    org_h: int
    org_w: int

    def as_array(self) -> np.ndarray:
        """Pack into a float32 vector [scale, pad_left, pad_top, org_w, org_h]
        so a batch of infos can ride to device as one (B, 5) tensor."""
        return np.array(
            [self.scale, self.pad_left, self.pad_top, self.org_w, self.org_h],
            dtype=np.float32,
        )


def letterbox_image(
    img: np.ndarray,
    dst_size,
    stride: int = 64,
    fill_value: int = 128,
    only_downscale: bool = False,
    training: bool = True,
):
    """Resize ``img`` (H, W, 3 uint8) keeping aspect ratio, pad to grid-aligned shape.

    Returns (padded_img uint8, LetterboxInfo).
    """
    if isinstance(dst_size, int):
        dst_size = [dst_size, dst_size]
    dst_size = list(dst_size)

    # round destination up to a multiple of stride (reference rounds up, not down)
    rem_h, rem_w = dst_size[0] % stride, dst_size[1] % stride
    dst_size[0] += (stride - rem_h) if rem_h else 0
    dst_size[1] += (stride - rem_w) if rem_w else 0

    org_h, org_w = img.shape[:2]
    scale = float(min(dst_size[0] / org_h, dst_size[1] / org_w))
    if only_downscale:
        scale = min(scale, 1.0)
    if scale != 1.0:
        resize_h, resize_w = int(org_h * scale), int(org_w * scale)
        img_resize = cv2.resize(img, (resize_w, resize_h), interpolation=0)
    else:
        resize_h, resize_w = org_h, org_w
        img_resize = img

    if training:
        pad_h, pad_w = dst_size[0] - resize_h, dst_size[1] - resize_w
        top, left = pad_h // 2, pad_w // 2
        bottom, right = pad_h - top, pad_w - left
        out = np.full((dst_size[0], dst_size[1], 3), fill_value, dtype=np.uint8)
        out[top : top + resize_h, left : left + resize_w] = img_resize
    else:
        pad_h = (dst_size[0] - resize_h) % stride
        pad_w = (dst_size[1] - resize_w) % stride
        top = int(round(pad_h / 2))
        left = int(round(pad_w / 2))
        bottom, right = pad_h - top, pad_w - left
        out = cv2.copyMakeBorder(
            img_resize, top, bottom, left, right, cv2.BORDER_CONSTANT,
            value=(fill_value, fill_value, fill_value),
        )

    info = LetterboxInfo(
        scale=scale, pad_top=top, pad_left=left, pad_bottom=bottom,
        pad_right=right, org_h=org_h, org_w=org_w,
    )
    return out.astype(np.uint8), info


def letterbox_boxes(boxes: np.ndarray, info: LetterboxInfo) -> np.ndarray:
    """Map original-image xyxy boxes into letterboxed coordinates
    (utils/bbox_tools.py:38-49)."""
    out = np.asarray(boxes, dtype=np.float32) * info.scale
    out[..., [1, 3]] += info.pad_top
    out[..., [0, 2]] += info.pad_left
    return out


def unletterbox_boxes_np(boxes: np.ndarray, info: LetterboxInfo) -> np.ndarray:
    """Inverse of `letterbox_boxes`, clipped to the original image bounds."""
    out = np.asarray(boxes, dtype=np.float32).copy()
    out[..., [0, 2]] -= info.pad_left
    out[..., [1, 3]] -= info.pad_top
    out /= info.scale
    out[..., [0, 2]] = out[..., [0, 2]].clip(0, info.org_w)
    out[..., [1, 3]] = out[..., [1, 3]].clip(0, info.org_h)
    return out
