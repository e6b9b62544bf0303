"""YOLOX family — CSP trunk (shared with YOLOv5) or DarkNet backbone +
decoupled head.

Rebuilds models/normal/yolox_{s,m,l}.py and yolox_darknet{21,53}.py:

* yolox_s/m/l: the exact YOLOv5 CSP backbone+PAN trunk (yolox_s.py:10-80 is
  the same graph), followed by a per-scale decoupled head (:112-137): stem
  3x3 -> [cls tower -> 1x1 cls(nc)] and [conv tower -> 1x1 reg(4), 1x1
  cof(1)], anchor-free (num_anchors=1),
* focal bias prior -log((1-p)/p) on cls and reg conv biases (:174-198),
* darknet21/53: plain residual DarkNet backbone (yolox_darknet53.py:7-110)
  with an SPP bridge + simplified top-down neck (:112-160).

Output: per-scale NHWC maps (B, H, W, A*(4+1+nc)) with channel order
[x, y, w, h, cof, cls...]; decode is xy=(p+grid)*stride, wh=exp(p)*stride.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import KAIMING, BasicBottleneck, ConvBnAct, SPP, upsample2x
from .yolov5 import CSPTrunk, YOLOV5_SIZES, YOLOv5Spec

__all__ = ["YOLOX", "YOLOXDarknet", "YOLOX_SIZES"]


@dataclasses.dataclass(frozen=True)
class YOLOXSpec:
    trunk: YOLOv5Spec
    head_width: int  # decoupled-head mid channels
    tower_depth: int = 1  # conv blocks per cls/reg tower


YOLOX_SIZES: dict[str, YOLOXSpec] = {
    "s": YOLOXSpec(YOLOV5_SIZES["s"], 128, 1),
    "m": YOLOXSpec(YOLOV5_SIZES["m"], 192, 1),
    "l": YOLOXSpec(YOLOV5_SIZES["l"], 256, 1),
}


def _prior_bias(prior_prob: float):
    value = -math.log((1 - prior_prob) / prior_prob)

    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.full(shape, value, dtype)

    return init


class DecoupledHead(nn.Module):
    """Per-scale decoupled detection head (models/normal/yolox_s.py:112-137)."""

    num_class: int
    mid_channels: int
    num_anchor: int = 1
    tower_depth: int = 1
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        na, nc = self.num_anchor, self.num_class
        x = ConvBnAct(self.mid_channels, 3, 1, dtype=self.dtype, name="stem")(x, train)

        c = x
        for i in range(self.tower_depth):
            c = ConvBnAct(self.mid_channels, 3, 1, dtype=self.dtype, name=f"cls_tower{i}")(c, train)
        cls = nn.Conv(
            na * nc, (1, 1), kernel_init=KAIMING,
            bias_init=_prior_bias(self.prior_prob), dtype=self.dtype, name="cls",
        )(c)

        f = x
        for i in range(self.tower_depth):
            f = ConvBnAct(self.mid_channels, 3, 1, dtype=self.dtype, name=f"reg_tower{i}")(f, train)
        reg = nn.Conv(
            na * 4, (1, 1), kernel_init=KAIMING,
            bias_init=_prior_bias(self.prior_prob), dtype=self.dtype, name="reg",
        )(f)
        cof = nn.Conv(
            na * 1, (1, 1), kernel_init=KAIMING, dtype=self.dtype, name="cof"
        )(f)

        b, h, w, _ = x.shape
        out = jnp.concatenate(
            [
                reg.reshape(b, h, w, na, 4),
                cof.reshape(b, h, w, na, 1),
                cls.reshape(b, h, w, na, nc),
            ],
            axis=-1,
        )
        return out.reshape(b, h, w, na * (5 + nc))


class YOLOX(nn.Module):
    num_class: int
    spec: YOLOXSpec = YOLOX_SIZES["s"]
    num_anchor: int = 1
    dtype: Any = jnp.float32
    remat: bool = False
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        feats = CSPTrunk(
            spec=self.spec.trunk, dtype=self.dtype, remat=self.remat,
            s2d_stem=self.s2d_stem, name="trunk",
        )(x, train)
        outs = []
        for i, f in enumerate(feats):
            outs.append(
                DecoupledHead(
                    num_class=self.num_class,
                    mid_channels=self.spec.head_width,
                    num_anchor=self.num_anchor,
                    tower_depth=self.spec.tower_depth,
                    dtype=self.dtype,
                    name=f"head{i}",
                )(f, train)
            )
        return outs


class DarknetBackbone(nn.Module):
    """Plain residual DarkNet (yolox_darknet53.py:7-110). Stage block counts:
    darknet53 -> (1, 2, 8, 8, 4), darknet21 -> (1, 1, 2, 2, 1)."""

    num_blocks: tuple = (1, 2, 8, 8, 4)
    base_width: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.base_width
        x = ConvBnAct(w, 3, 1, dtype=self.dtype, name="stem")(x, train)
        feats = []
        ch = w
        for si, nb in enumerate(self.num_blocks):
            ch = ch * 2
            x = ConvBnAct(ch, 3, 2, dtype=self.dtype, name=f"s{si}_down")(x, train)
            for bi in range(nb):
                x = BasicBottleneck(
                    ch, shortcut=True, expand_ratio=0.5, dtype=self.dtype,
                    name=f"s{si}_b{bi}",
                )(x, train)
            feats.append(x)
        # /8, /16, /32 taps
        return feats[-3], feats[-2], feats[-1]


class YOLOXDarknet(nn.Module):
    """DarkNet21/53 backbone + SPP bridge + simplified top-down neck +
    decoupled head (yolox_darknet53.py:112-174)."""

    num_class: int
    num_blocks: tuple = (1, 2, 8, 8, 4)
    head_width: int = 128
    num_anchor: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        c3, c4, c5 = DarknetBackbone(
            num_blocks=self.num_blocks, dtype=self.dtype, name="backbone"
        )(x, train)
        w = c5.shape[-1]  # 1024

        # SPP bridge on the /32 feature (:120-128)
        y = ConvBnAct(w // 2, 1, 1, padding=0, dtype=self.dtype, name="bridge1")(c5, train)
        y = ConvBnAct(w, 3, 1, dtype=self.dtype, name="bridge2")(y, train)
        y = SPP(w // 2, dtype=self.dtype, name="spp")(y, train)
        y = ConvBnAct(w, 3, 1, dtype=self.dtype, name="bridge3")(y, train)
        p5 = ConvBnAct(w // 2, 1, 1, padding=0, dtype=self.dtype, name="bridge4")(y, train)

        # top-down neck (:130-160)
        t = ConvBnAct(w // 4, 1, 1, padding=0, dtype=self.dtype, name="lat5")(p5, train)
        t = upsample2x(t)
        p4 = jnp.concatenate([t, c4], axis=-1)
        p4 = ConvBnAct(w // 4, 1, 1, padding=0, dtype=self.dtype, name="fuse4")(p4, train)
        t = ConvBnAct(w // 8, 1, 1, padding=0, dtype=self.dtype, name="lat4")(p4, train)
        t = upsample2x(t)
        p3 = jnp.concatenate([t, c3], axis=-1)
        p3 = ConvBnAct(w // 8, 1, 1, padding=0, dtype=self.dtype, name="fuse3")(p3, train)

        outs = []
        for i, f in enumerate([p3, p4, p5]):
            outs.append(
                DecoupledHead(
                    num_class=self.num_class,
                    mid_channels=self.head_width,
                    num_anchor=self.num_anchor,
                    tower_depth=2,
                    dtype=self.dtype,
                    name=f"head{i}",
                )(f, train)
            )
        return outs
