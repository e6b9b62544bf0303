"""RetinaNet — ResNet-50 backbone, P3-P7 FPN, shared cls/reg towers, NHWC.

Rebuilds models/normal/retinanet.py:7-92 + utils/layer_tools.py:555-818:

* ResNet Bottleneck backbone (7x7/2 stem + 3x3/2 maxpool, layers [3,4,6,3]),
  BN eps 1e-3 / torch-momentum 0.03 (RetinaNet._init_weights rewrites every
  BatchNorm2d to these, retinanet.py:38-41), taps c3/c4/c5,
* conv-only FPN: lateral 1x1 + top-down add + 3x3 smooth; P6 = 3x3/2 on c5,
  P7 = 3x3/2 on relu(P6) (RetinaNetPyramidFeatures:769-818),
* 4-conv relu towers; cls tower conv biases initialized to the focal prior
  -log((1-p)/p) (RetinaNetClassification:745-754),
* 9 anchors/cell (3 scales x 3 ratios).

Output: (reg (B, sum HW*9, 4) deltas, cls (B, sum HW*9, nc) logits) — same
contract as the reference's forward (retinanet.py:60-86).

The "experiment" variant (models/normal/retinanet_experiment.py:67-154) adds
an objectness channel: reg output is (..., 5) = 4 deltas + 1 cof logit.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import KAIMING, TorchBatchNorm, upsample2x

__all__ = ["RetinaNet", "ResNetBackbone"]


def _prior_bias(prior_prob: float = 0.01):
    value = -math.log((1 - prior_prob) / prior_prob)

    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.full(shape, value, dtype)

    return init


class BottleneckBlock(nn.Module):
    """ResNet bottleneck 1x1-3x3-1x1, expansion 4 (layer_tools.py:580-612)."""

    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            # eps 1e-3 / torch momentum 0.03: RetinaNet._init_weights
            # rewrites EVERY BatchNorm2d to these values
            # (models/normal/retinanet.py:38-41)
            return TorchBatchNorm(
                use_running_average=not train, momentum=0.97, epsilon=1e-3,
                dtype=self.dtype, name=name,
            )

        out_ch = self.planes * 4
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, kernel_init=KAIMING,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, kernel_init=KAIMING,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, kernel_init=KAIMING,
                    dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(
                out_ch, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, kernel_init=KAIMING, dtype=self.dtype,
                name="down_conv",
            )(x)
            identity = bn("down_bn")(identity)
        return nn.relu(y + identity)


class ResNetBackbone(nn.Module):
    """ResNet-50-style backbone returning c3/c4/c5 (layer_tools.py:605-700)."""

    layers: tuple = (3, 4, 6, 3)
    inplane: int = 64
    dtype: Any = jnp.float32
    # per-bottleneck-block activation remat (same params/grads, frees HBM)
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        Block = (nn.remat(BottleneckBlock, static_argnums=(2,))
                 if self.remat else BottleneckBlock)
        x = nn.Conv(self.inplane, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, kernel_init=KAIMING, dtype=self.dtype,
                    name="stem_conv")(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        for si, n_blocks in enumerate(self.layers):
            planes = self.inplane * (2**si)
            stride = 1 if si == 0 else 2
            for bi in range(n_blocks):
                x = Block(
                    planes, stride if bi == 0 else 1, dtype=self.dtype,
                    name=f"layer{si + 1}_{bi}",
                )(x, train)
            feats.append(x)
        return feats[1], feats[2], feats[3]  # c3 /8, c4 /16, c5 /32


class FPN(nn.Module):
    """Conv-only P3-P7 pyramid (layer_tools.py:769-818)."""

    feature_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c3, c4, c5):
        conv = lambda ch, k, s, name, pad=None: nn.Conv(
            ch, (k, k), strides=(s, s), padding=k // 2 if pad is None else pad,
            kernel_init=KAIMING, dtype=self.dtype, name=name,
        )
        fs = self.feature_size
        p5_lat = conv(fs, 1, 1, "p5_1", 0)(c5)
        p5_up = upsample2x(p5_lat)
        p5 = conv(fs, 3, 1, "p5_2")(p5_lat)

        p4_lat = conv(fs, 1, 1, "p4_1", 0)(c4) + p5_up
        p4_up = upsample2x(p4_lat)
        p4 = conv(fs, 3, 1, "p4_2")(p4_lat)

        p3 = conv(fs, 1, 1, "p3_1", 0)(c3) + p4_up
        p3 = conv(fs, 3, 1, "p3_2")(p3)

        p6 = conv(fs, 3, 2, "p6")(c5)
        # LIVE reference behavior: RetinaNet._init_weights flips every ReLU
        # to inplace=True (models/normal/retinanet.py:42-43), so the FPN's
        # `p7 = self.relu(p6)` clobbers p6 — the towers consume relu(p6).
        p6 = nn.relu(p6)
        p7 = conv(fs, 3, 2, "p7")(p6)
        return p3, p4, p5, p6, p7


class _Tower(nn.Module):
    """Shared 4x(3x3 conv + relu) tower + 3x3 output conv
    (layer_tools.py:703-767)."""

    out_channels: int
    inner: int = 256
    bias_init_fn: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bias_init = self.bias_init_fn or nn.initializers.zeros
        for i in range(4):
            x = nn.Conv(self.inner, (3, 3), padding=1, kernel_init=KAIMING,
                        bias_init=bias_init, dtype=self.dtype,
                        name=f"conv{i + 1}")(x)
            x = nn.relu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       kernel_init=KAIMING, bias_init=bias_init,
                       dtype=self.dtype, name="out")(x)


class RetinaNet(nn.Module):
    num_class: int
    num_anchor: int = 9
    resnet_layers: tuple = (3, 4, 6, 3)
    with_objectness: bool = False  # the "experiment" variant (reg -> 5 dims)
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c3, c4, c5 = ResNetBackbone(
            layers=self.resnet_layers, dtype=self.dtype, remat=self.remat,
            name="backbone",
        )(x, train)
        pyramid = FPN(dtype=self.dtype, name="fpn")(c3, c4, c5)

        reg_dim = 5 if self.with_objectness else 4
        reg_tower = _Tower(self.num_anchor * reg_dim, dtype=self.dtype,
                           name="regression")
        cls_tower = _Tower(self.num_anchor * self.num_class,
                           bias_init_fn=_prior_bias(), dtype=self.dtype,
                           name="classification")

        regs, clss = [], []
        for p in pyramid:
            b, h, w, _ = p.shape
            regs.append(reg_tower(p).reshape(b, h * w * self.num_anchor, reg_dim))
            clss.append(
                cls_tower(p).reshape(b, h * w * self.num_anchor, self.num_class)
            )
        return jnp.concatenate(regs, axis=1), jnp.concatenate(clss, axis=1)
