"""YOLOv5 family — one graph, parameterized by a size spec.

Rebuilds the reference's hand-unrolled per-size files
(models/normal/yolov5{s,m,l,x}.py, models/normal/yolov5s_plain_bscp.py,
models/depthwise/yolov5{s,m,l,x}_dw.py) as a single NHWC flax module:

* 6x6/2 conv stem (the reference's Focus replacement, yolov5s.py:16),
* CSPDarknet backbone: 4 x [3x3/2 conv -> C3 CSP block], FastSPP tail,
* PANet head: two top-down (1x1 + upsample + concat + C3) then two
  bottom-up (3x3/2 + concat + C3) stages,
* Detect: one 1x1 conv per scale with the RetinaNet-style bias prior
  (yolov5s.py:47-85).

Depthwise variants (models/depthwise/*) use a Focus(3x3) stem, depthwise
convs, classic SPP placed BEFORE the last backbone CSP block, and a
non-shortcut final backbone block — all captured by spec flags.

Returns a list of 3 maps (B, H/8, W/8, A*(5+nc)), /16, /32 — NHWC raw
logits; decode/loss reshape to (..., A, 5+nc).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import (
    BottleneckCSP,
    C3BottleneckCSP,
    ConvBnAct,
    DetectHead,
    DWConvBnAct,
    FastSPP,
    Focus,
    SPP,
    upsample2x,
)

__all__ = ["CSPTrunk", "YOLOv5", "YOLOV5_SIZES", "YOLOv5Spec", "space_to_depth2"]


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (dy, dx, c).

    TPU stem trick: the reference's 6x6/2 stem conv reads a 3-channel
    640x640 image — the VPU/MXU lane dimension (channels) is padded 3->8
    at the largest spatial extent in the network. Rearranging 2x2 pixel
    blocks into channels first makes the stem a 3x3/1 conv over a
    (320, 320, 12) input: identical arithmetic (see
    nn/deploy.py:fold_stem_to_s2d for the exact kernel mapping), 4x less
    padded-lane waste on the most expensive feature map.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


@dataclasses.dataclass(frozen=True)
class YOLOv5Spec:
    base_width: int  # stem channels; stages are x2, x4, x8, x16
    backbone_depths: tuple  # C3 block counts for the 4 backbone stages
    head_depth: int  # C3 block count for each of the 4 head stages
    depthwise: bool = False
    plain_bscp: bool = False  # BottleneckCSP instead of C3 (yolov5s_plain_bscp)


YOLOV5_SIZES: dict[str, YOLOv5Spec] = {
    "s": YOLOv5Spec(32, (1, 2, 3, 1), 1),
    "m": YOLOv5Spec(48, (2, 4, 6, 2), 2),
    "l": YOLOv5Spec(64, (3, 6, 9, 3), 3),
    "x": YOLOv5Spec(80, (4, 12, 12, 4), 4),
    "s_plain": YOLOv5Spec(32, (1, 2, 3, 1), 1, plain_bscp=True),
    "s_dw": YOLOv5Spec(32, (1, 3, 3, 1), 1, depthwise=True),
    "m_dw": YOLOv5Spec(48, (2, 6, 6, 2), 2, depthwise=True),
    "l_dw": YOLOv5Spec(64, (3, 9, 9, 3), 3, depthwise=True),
    "x_dw": YOLOv5Spec(80, (4, 12, 12, 4), 4, depthwise=True),
}


class CSPTrunk(nn.Module):
    """CSPDarknet backbone + PANet neck — the shared trunk of the YOLOv5
    family AND YOLOX (models/normal/yolox_s.py:10-80 uses the identical
    graph). Returns the three PAN feature maps at strides 8/16/32 with
    channels (4w, 8w, 16w)."""

    spec: YOLOv5Spec = YOLOV5_SIZES["s"]
    dtype: Any = jnp.float32
    # Rematerialize each CSP stage in the backward pass (jax.checkpoint per
    # block — same params/grads, ~extra forward of FLOPs for a large
    # activation-memory cut; lifts the b128@640 HBM ceiling on a 16 GB chip).
    remat: bool = False
    # Space-to-depth stem: mathematically equivalent reparam of the 6x6/2
    # stem (see space_to_depth2); weights convert both ways via
    # nn/deploy.py:fold_stem_to_s2d.
    s2d_stem: bool = False

    def _conv(self, out, kernel, stride, name):
        if self.spec.depthwise and kernel > 1:
            return DWConvBnAct(out, kernel, stride, dtype=self.dtype, name=name)
        pad = 0 if kernel == 1 else None
        return ConvBnAct(out, kernel, stride, padding=pad, dtype=self.dtype, name=name)

    def _csp(self, out, shortcut, depth, name):
        cls = BottleneckCSP if self.spec.plain_bscp else C3BottleneckCSP
        if self.remat:
            cls = nn.remat(cls, static_argnums=(2,))
        return cls(out, shortcut=shortcut, num_blocks=depth, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        """x: (B, H, W, 3) float in [0, 1]; H, W multiples of 32."""
        w = self.spec.base_width
        d = self.spec.backbone_depths
        hd = self.spec.head_depth
        dw = self.spec.depthwise

        # stem: /2
        if dw:
            x = Focus(w, 3, 1, dtype=self.dtype, name="stem")(x, train)
        elif self.s2d_stem:
            x = space_to_depth2(x)
            x = ConvBnAct(w, 3, 1, padding=1, dtype=self.dtype, name="stem")(x, train)
        else:
            x = ConvBnAct(w, 6, 2, padding=2, dtype=self.dtype, name="stem")(x, train)

        # backbone
        x = self._conv(w * 2, 3, 2, "b1_conv")(x, train)  # /4
        x = self._csp(w * 2, True, d[0], "b1_csp")(x, train)
        x = self._conv(w * 4, 3, 2, "b2_conv")(x, train)  # /8
        p3 = self._csp(w * 4, True, d[1], "b2_csp")(x, train)
        x = self._conv(w * 8, 3, 2, "b3_conv")(p3, train)  # /16
        p4 = self._csp(w * 8, True, d[2], "b3_csp")(x, train)
        x = self._conv(w * 16, 3, 2, "b4_conv")(p4, train)  # /32
        if dw:
            # dw variant: SPP before the (non-shortcut) final CSP block
            x = SPP(w * 16, dtype=self.dtype, name="b4_spp")(x, train)
            p5 = self._csp(w * 16, False, d[3], "b4_csp")(x, train)
        else:
            x = self._csp(w * 16, True, d[3], "b4_csp")(x, train)
            p5 = FastSPP(w * 16, dtype=self.dtype, name="b4_spp")(x, train)

        # PAN top-down
        h1 = self._conv(w * 8, 1, 1, "h1_conv")(p5, train)  # /32, w*8
        x = upsample2x(h1)
        x = jnp.concatenate([x, p4], axis=-1)
        x = self._csp(w * 8, False, hd, "h1_csp")(x, train)  # /16
        h2 = self._conv(w * 4, 1, 1, "h2_conv")(x, train)
        x = upsample2x(h2)
        x = jnp.concatenate([x, p3], axis=-1)
        out_small = self._csp(w * 4, False, hd, "h2_csp")(x, train)  # /8

        # PAN bottom-up
        x = self._conv(w * 4, 3, 2, "h3_conv")(out_small, train)  # /16
        x = jnp.concatenate([x, h2], axis=-1)
        out_mid = self._csp(w * 8, False, hd, "h3_csp")(x, train)
        x = self._conv(w * 8, 3, 2, "h4_conv")(out_mid, train)  # /32
        x = jnp.concatenate([x, h1], axis=-1)
        out_large = self._csp(w * 16, False, hd, "h4_csp")(x, train)

        return [out_small, out_mid, out_large]


class YOLOv5(nn.Module):
    num_class: int
    spec: YOLOv5Spec = YOLOV5_SIZES["s"]
    num_anchor: int = 3
    dtype: Any = jnp.float32
    remat: bool = False
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        feats = CSPTrunk(
            spec=self.spec, dtype=self.dtype, remat=self.remat,
            s2d_stem=self.s2d_stem, name="trunk",
        )(x, train)
        return DetectHead(
            num_class=self.num_class,
            num_anchor=self.num_anchor,
            strides=(8, 16, 32),
            dtype=self.dtype,
            name="detect",
        )(feats)
