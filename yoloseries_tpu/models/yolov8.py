"""YOLOv8 — C2f backbone + PAN, anchor-free DFL split heads, 4 scales.

Rebuilds models/normal/yolov8.py:86-182 (NHWC):

* stem: two 3x3/2 convs, then 4 x [C2f -> 3x3/2 conv] backbone with FastSPP,
  per-stage C2f depths int((3,6,6,3) * scale) (invoked with scale=0.5 in
  train_yolov8.py; widths are NOT scaled in the reference),
* PAN over FOUR scales /4, /8, /16, /32 (x_18/x_21/x_24/x_27 taps),
* per-scale split head (:9-84): bbox branch (2 x ConvBnAct(c/4) + 1x1 ->
  4*reg DFL logits), cls branch (2 x ConvBnAct(128) + 1x1 -> nc),
* bias priors: box output bias 1.0, cls bias log(5/nc/(640/s)^2) (:59-69).

Output: dict-less list of 4 NHWC maps (B, H, W, 4*reg + nc), channel order
[dfl(64), cls(nc)].
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import C2f, ConvBnAct, FastSPP, KAIMING, upsample2x

__all__ = ["YOLOv8"]


def _cls_bias(stride: int, num_class: int):
    value = math.log(5 / num_class / (640 / stride) ** 2)

    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.full(shape, value, dtype)

    return init


class V8Head(nn.Module):
    """Split bbox(DFL)/cls head for one scale (models/normal/yolov8.py:9-84)."""

    num_class: int
    stride: int
    reg: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        b = ConvBnAct(c // 4, 3, 1, dtype=self.dtype, name="box1")(x, train)
        b = ConvBnAct(c // 4, 3, 1, dtype=self.dtype, name="box2")(b, train)
        box = nn.Conv(
            4 * self.reg, (1, 1), kernel_init=KAIMING,
            bias_init=nn.initializers.ones, dtype=self.dtype, name="box_out",
        )(b)

        cl = ConvBnAct(128, 3, 1, dtype=self.dtype, name="cls1")(x, train)
        cl = ConvBnAct(128, 3, 1, dtype=self.dtype, name="cls2")(cl, train)
        cls = nn.Conv(
            self.num_class, (1, 1), kernel_init=KAIMING,
            bias_init=_cls_bias(self.stride, self.num_class),
            dtype=self.dtype, name="cls_out",
        )(cl)
        return jnp.concatenate([box, cls], axis=-1)


class YOLOv8(nn.Module):
    num_class: int
    scale: float = 0.5  # C2f depth multiplier (train_yolov8.py invocation)
    reg: int = 16
    dtype: Any = jnp.float32
    # per-C2f-block activation remat (same params/grads, frees HBM)
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        # Reference backbone depths are per-stage (3, 6, 6, 3) * scale
        # (models/normal/yolov8.py:100-107); head C2f blocks are 3 * scale.
        d3 = max(int(3 * self.scale), 1)
        d6 = max(int(6 * self.scale), 1)
        C2f_ = nn.remat(C2f, static_argnums=(2,)) if self.remat else C2f
        cba = lambda ch, k, s, name: ConvBnAct(ch, k, s, dtype=self.dtype, name=name)
        c2f = lambda ch, sc, name, d=d3: C2f_(
            ch, shortcut=sc, num_blocks=d, dtype=self.dtype, name=name
        )

        x = cba(64, 3, 2, "stem1")(x, train)  # /2
        x = cba(128, 3, 2, "stem2")(x, train)  # /4

        x2 = c2f(128, True, "b1_c2f")(x, train)  # /4
        x = cba(256, 3, 2, "b1_conv")(x2, train)  # /8
        x4 = c2f(256, True, "b2_c2f", d6)(x, train)
        x = cba(512, 3, 2, "b2_conv")(x4, train)  # /16
        x6 = c2f(512, True, "b3_c2f", d6)(x, train)
        x = cba(1024, 3, 2, "b3_conv")(x6, train)  # /32
        x8 = c2f(1024, True, "b4_c2f")(x, train)
        x9 = FastSPP(1024, dtype=self.dtype, name="b4_spp")(x8, train)

        # top-down
        x = jnp.concatenate([upsample2x(x9), x6], axis=-1)
        x12 = c2f(512, False, "h1_c2f")(x, train)  # /16
        x = jnp.concatenate([upsample2x(x12), x4], axis=-1)
        x15 = c2f(256, False, "h2_c2f")(x, train)  # /8
        x = jnp.concatenate([upsample2x(x15), x2], axis=-1)
        x18 = c2f(128, False, "h3_c2f")(x, train)  # /4

        # bottom-up
        x = cba(128, 3, 2, "h3_conv")(x18, train)
        x21 = c2f(256, False, "h3_c2f2")(jnp.concatenate([x, x15], -1), train)  # /8
        x = cba(256, 3, 2, "h2_conv")(x21, train)
        x24 = c2f(512, False, "h2_c2f2")(jnp.concatenate([x, x12], -1), train)  # /16
        x = cba(512, 3, 2, "h1_conv")(x24, train)
        x27 = c2f(1024, False, "h1_c2f2")(jnp.concatenate([x, x9], -1), train)  # /32

        outs = []
        for i, (f, s) in enumerate(zip([x18, x21, x24, x27], (4, 8, 16, 32))):
            outs.append(
                V8Head(
                    num_class=self.num_class, stride=s, reg=self.reg,
                    dtype=self.dtype, name=f"head{i}",
                )(f, train)
            )
        return outs
