"""FCOS — GroupNorm ResNet-50 + P3-P7 FPN + shared cls/ctr/reg head, and the
CSPNet-backbone variant. NHWC rebuild of models/normal/fcos.py:261-325 and
models/normal/fcos_cspnet.py:12-189.

* backbone: ResNet bottleneck with GroupNorm(32) everywhere (:27-119),
* FPN: P5 from c5, P6 = 3x3/2 on P5 (unlike RetinaNet's c5!), P7 on
  relu(P6); conv init normal(std 0.001) (:130-177),
* head shared across the 5 levels: 4 x (3x3 conv no-bias + GN + relu)
  cls and reg towers; cls(nc, focal bias prior), centerness(1) off the reg
  tower, reg(4) with optional per-level Scale then relu (:179-259),
* fcos_cspnet: the YOLOv5s CSP trunk feeds 3 levels (/8, /16, /32) into the
  same head (fcos_cspnet.py:12-189).

Output: (cls_list, reg_list, ctr_list) — per-level NHWC maps, reg is
post-relu ltrb in stride units.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import KAIMING, Scale, upsample2x
from .yolov5 import CSPTrunk, YOLOV5_SIZES

__all__ = ["FCOS", "FCOSCSPNet"]


def _prior_bias(p: float = 0.01):
    v = -math.log((1 - p) / p)
    return lambda key, shape, dtype=jnp.float32: jnp.full(shape, v, dtype)


class GNBottleneck(nn.Module):
    """ResNet bottleneck with GroupNorm(32) (models/normal/fcos.py:27-56)."""

    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gn = lambda name: nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        out_ch = self.planes * 4
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, kernel_init=KAIMING,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(gn("gn1")(y))
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=KAIMING,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(gn("gn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, kernel_init=KAIMING,
                    dtype=self.dtype, name="conv3")(y)
        y = gn("gn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=KAIMING,
                               dtype=self.dtype, name="down_conv")(x)
            identity = gn("down_gn")(identity)
        return nn.relu(y + identity)


class GNResNet(nn.Module):
    """GroupNorm ResNet-50 (models/normal/fcos.py:58-119); no BN state."""

    layers: tuple = (3, 4, 6, 3)
    inplane: int = 64
    dtype: Any = jnp.float32
    # per-bottleneck-block activation remat (same params/grads, frees HBM)
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        Block = (nn.remat(GNBottleneck) if self.remat else GNBottleneck)
        x = nn.Conv(self.inplane, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, kernel_init=KAIMING, dtype=self.dtype,
                    name="stem_conv")(x)
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                         name="stem_gn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for si, n_blocks in enumerate(self.layers):
            planes = self.inplane * (2**si)
            stride = 1 if si == 0 else 2
            for bi in range(n_blocks):
                x = Block(planes, stride if bi == 0 else 1,
                          dtype=self.dtype, name=f"layer{si + 1}_{bi}")(x)
            feats.append(x)
        return feats[1], feats[2], feats[3]


class FCOSFPN(nn.Module):
    """P3-P7; P6 comes from P5 (models/normal/fcos.py:130-177)."""

    feature_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c3, c4, c5):
        init = nn.initializers.normal(0.001)
        conv = lambda k, s, name: nn.Conv(
            self.feature_size, (k, k), strides=(s, s), padding=k // 2,
            kernel_init=init, dtype=self.dtype, name=name,
        )
        p5 = conv(3, 1, "p5_2")(conv(1, 1, "p5_1")(c5))
        p4 = conv(1, 1, "p4_1")(c4) + upsample2x(p5)
        p4 = conv(3, 1, "p4_2")(p4)
        p3 = conv(1, 1, "p3_1")(c3) + upsample2x(p4)
        p3 = conv(3, 1, "p3_2")(p3)
        p6 = conv(3, 2, "p6")(p5)
        p7 = conv(3, 2, "p7")(nn.relu(p6))
        return p3, p4, p5, p6, p7


class FCOSHead(nn.Module):
    """Shared towers + cls/ctr/reg outputs (models/normal/fcos.py:179-259)."""

    num_class: int
    in_channels: int = 256
    num_levels: int = 5
    enable_scale: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        gn = lambda name: nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        cls_tower = []
        reg_tower = []
        for i in range(4):
            cls_tower.append((
                nn.Conv(self.in_channels, (3, 3), padding=1, use_bias=False,
                        kernel_init=KAIMING, dtype=self.dtype, name=f"cls_conv{i}"),
                gn(f"cls_gn{i}"),
            ))
            reg_tower.append((
                nn.Conv(self.in_channels, (3, 3), padding=1, use_bias=False,
                        kernel_init=KAIMING, dtype=self.dtype, name=f"reg_conv{i}"),
                gn(f"reg_gn{i}"),
            ))
        cls_out = nn.Conv(self.num_class, (3, 3), padding=1, kernel_init=KAIMING,
                          bias_init=_prior_bias(), dtype=self.dtype, name="cls_out")
        reg_out = nn.Conv(4, (3, 3), padding=1, kernel_init=KAIMING,
                          dtype=self.dtype, name="reg_out")
        ctr_out = nn.Conv(1, (3, 3), padding=1, kernel_init=KAIMING,
                          dtype=self.dtype, name="ctr_out")
        scales = (
            [Scale(name=f"scale{i}") for i in range(self.num_levels)]
            if self.enable_scale else None
        )

        cls_fms, reg_fms, ctr_fms = [], [], []
        for li, f in enumerate(feats):
            c = f
            for conv, norm in cls_tower:
                c = nn.relu(norm(conv(c)))
            r = f
            for conv, norm in reg_tower:
                r = nn.relu(norm(conv(r)))
            cls_fms.append(cls_out(c))
            ctr_fms.append(ctr_out(r))
            reg = reg_out(r)
            if scales is not None:
                reg = scales[li](reg)
            reg_fms.append(nn.relu(reg))
        return cls_fms, reg_fms, ctr_fms


class FCOS(nn.Module):
    num_class: int
    resnet_layers: tuple = (3, 4, 6, 3)
    enable_scale: bool = True
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # GN backbone: no batch statistics
        c3, c4, c5 = GNResNet(layers=self.resnet_layers, dtype=self.dtype,
                              remat=self.remat, name="backbone")(x)
        feats = FCOSFPN(dtype=self.dtype, name="fpn")(c3, c4, c5)
        return FCOSHead(
            num_class=self.num_class, num_levels=5,
            enable_scale=self.enable_scale, dtype=self.dtype, name="head",
        )(feats)


class FCOSCSPNet(nn.Module):
    """FCOS head on the YOLOv5s CSP trunk, 3 levels at /8, /16, /32
    (models/normal/fcos_cspnet.py:12-189)."""

    num_class: int
    enable_scale: bool = True
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = CSPTrunk(spec=YOLOV5_SIZES["s"], dtype=self.dtype,
                         remat=self.remat, name="trunk")(x, train)
        # unify channels to 256 for the shared head
        feats = [
            nn.Conv(256, (1, 1), kernel_init=KAIMING, dtype=self.dtype,
                    name=f"lat{i}")(f)
            for i, f in enumerate(feats)
        ]
        return FCOSHead(
            num_class=self.num_class, num_levels=3,
            enable_scale=self.enable_scale, dtype=self.dtype, name="head",
        )(feats)
