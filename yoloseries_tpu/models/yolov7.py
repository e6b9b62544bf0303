"""YOLOv7 baseline — E-ELAN backbone, CSP-SPP head, RepConv + YOLOR
implicit-knowledge detect. NHWC rebuild of models/normal/yolov7.py:11-486.

Graph (reference layer indices in comments there):
* backbone: 3x3 stem -> /2 -> ELAN4 (taps after every 2nd conv) at /4,
  then 3 x [maxpool+conv downsample -> ELAN4] to /8, /16, /32
  (routes tapped at /8 and /16),
* head: CSPCSPP on /32, two top-down ELAN6 blocks (taps after EVERY conv),
  two bottom-up ELAN6 blocks with maxpool+conv downsampling,
* outputs: RepConv 3x3 (train-time 3-branch) per scale, then 1x1 detect
  convs wrapped in ImplicitAdd (input) / ImplicitMul (output) (:339-406),
* detect bias prior log(8/(640/stride)^2) / log(0.6/(nc-0.99)) (:365-376).

Output: 3 NHWC maps (B, H, W, A*(5+nc)) at strides 8/16/32 — same contract
as YOLOv5 (decode formulas identical, so the v5 decoder is reused).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import (
    CSPCSPP,
    ConvBnAct,
    ImplicitAdd,
    ImplicitMul,
    KAIMING,
    RepConv,
    upsample2x,
)
__all__ = ["YOLOv7"]

import math


def _v7_detect_bias(stride: int, num_class: int, num_anchor: int):
    """v7 prior uses a 640 reference size (models/normal/yolov7.py:365-376)."""

    def init(key, shape, dtype=jnp.float32):
        del key
        b = jnp.zeros((num_anchor, 5 + num_class), dtype)
        b = b.at[:, 4].set(math.log(8.0 / (640.0 / stride) ** 2))
        b = b.at[:, 5:].set(math.log(0.6 / (num_class - 0.99)))
        return b.reshape(shape)

    return init


class ELAN4(nn.Module):
    """Backbone ELAN: two 1x1 entries + two 3x3 pairs, tap after each pair
    (yolov7.py:24-32 / 34-46 pattern). 4 taps of ``mid`` -> 1x1 ``out``."""

    mid: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda ch, k, name: ConvBnAct(
            ch, k, 1, padding=0 if k == 1 else None, dtype=self.dtype, name=name
        )
        t1 = c(self.mid, 1, "cv1")(x, train)
        t2 = c(self.mid, 1, "cv2")(x, train)
        t3 = c(self.mid, 3, "cv4")(c(self.mid, 3, "cv3")(t2, train), train)
        t4 = c(self.mid, 3, "cv6")(c(self.mid, 3, "cv5")(t3, train), train)
        y = jnp.concatenate([t4, t3, t2, t1], axis=-1)
        return c(self.out, 1, "cv_out")(y, train)


class ELAN6(nn.Module):
    """Head ELAN: two 1x1 entries + 4 chained 3x3 convs at half width, tap
    after EVERY conv (yolov7.py:163-174 pattern). out = 1x1 over
    2*mid + 4*(mid//2) channels."""

    mid: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda ch, k, name: ConvBnAct(
            ch, k, 1, padding=0 if k == 1 else None, dtype=self.dtype, name=name
        )
        half = self.mid // 2
        t1 = c(self.mid, 1, "cv1")(x, train)
        t2 = c(self.mid, 1, "cv2")(x, train)
        t3 = c(half, 3, "cv3")(t2, train)
        t4 = c(half, 3, "cv4")(t3, train)
        t5 = c(half, 3, "cv5")(t4, train)
        t6 = c(half, 3, "cv6")(t5, train)
        y = jnp.concatenate([t6, t5, t4, t3, t2, t1], axis=-1)
        return c(self.out, 1, "cv_out")(y, train)


class MPDown(nn.Module):
    """maxpool+1x1 || 1x1+3x3/2 downsample merge (yolov7.py:34-39 pattern)."""

    mid: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p1 = nn.max_pool(x, (2, 2), strides=(2, 2))
        p1 = ConvBnAct(self.mid, 1, 1, padding=0, dtype=self.dtype, name="mp_cv")(
            p1, train
        )
        p2 = ConvBnAct(self.mid, 1, 1, padding=0, dtype=self.dtype, name="cv1")(
            x, train
        )
        p2 = ConvBnAct(self.mid, 3, 2, dtype=self.dtype, name="cv2")(p2, train)
        return jnp.concatenate([p2, p1], axis=-1)


class YOLOv7(nn.Module):
    num_class: int
    num_anchor: int = 3
    dtype: Any = jnp.float32
    # per-ELAN-block activation remat (same params/grads; frees HBM —
    # v7@640 holds the largest activations of the six families)
    remat: bool = False
    # reparameterized RepConv outputs (reference fuseforward,
    # models/normal/yolov7.py:460-464); params come from
    # nn.deploy.fold_repconv over a trained 3-branch tree
    deploy: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        c = lambda ch, k, s, name: ConvBnAct(
            ch, k, s, padding=0 if k == 1 else None, dtype=self.dtype, name=name
        )
        ELAN4_, ELAN6_ = (
            (nn.remat(ELAN4, static_argnums=(2,)),
             nn.remat(ELAN6, static_argnums=(2,)))
            if self.remat else (ELAN4, ELAN6)
        )
        # ---- backbone (yolov7.py:19-74 / forward :83-155)
        x = c(32, 3, 1, "stem")(x, train)
        x = c(64, 3, 2, "b1_cv1")(x, train)  # /2
        x = c(64, 3, 1, "b1_cv2")(x, train)
        x = c(128, 3, 2, "b2_down")(x, train)  # /4
        x = ELAN4_(64, 256, dtype=self.dtype, name="b2_elan")(x, train)

        x = MPDown(128, dtype=self.dtype, name="b3_down")(x, train)  # /8
        r3 = ELAN4_(128, 512, dtype=self.dtype, name="b3_elan")(x, train)
        x = MPDown(256, dtype=self.dtype, name="b4_down")(r3, train)  # /16
        r4 = ELAN4_(256, 1024, dtype=self.dtype, name="b4_elan")(x, train)
        x = MPDown(512, dtype=self.dtype, name="b5_down")(r4, train)  # /32
        x = ELAN4_(256, 1024, dtype=self.dtype, name="b5_elan")(x, train)

        # ---- head (yolov7.py:161-219 / :231-337)
        spp = CSPCSPP(512, dtype=self.dtype, name="spp")(x, train)  # /32

        t = upsample2x(c(256, 1, 1, "h1_lat")(spp, train))
        r4p = c(256, 1, 1, "h1_route")(r4, train)
        e1 = ELAN6_(256, 256, dtype=self.dtype, name="h1_elan")(
            jnp.concatenate([r4p, t], axis=-1), train
        )  # /16

        t = upsample2x(c(128, 1, 1, "h2_lat")(e1, train))
        r3p = c(128, 1, 1, "h2_route")(r3, train)
        e2 = ELAN6_(128, 128, dtype=self.dtype, name="h2_elan")(
            jnp.concatenate([r3p, t], axis=-1), train
        )  # /8

        d = MPDown(128, dtype=self.dtype, name="h3_down")(e2, train)  # /16
        e3 = ELAN6_(256, 256, dtype=self.dtype, name="h3_elan")(
            jnp.concatenate([d, e1], axis=-1), train
        )

        d = MPDown(256, dtype=self.dtype, name="h4_down")(e3, train)  # /32
        e4 = ELAN6_(512, 512, dtype=self.dtype, name="h4_elan")(
            jnp.concatenate([d, spp], axis=-1), train
        )

        outs_feats = [
            RepConv(256, deploy=self.deploy, dtype=self.dtype,
                    name="rep_s")(e2, train),
            RepConv(512, deploy=self.deploy, dtype=self.dtype,
                    name="rep_m")(e3, train),
            RepConv(1024, deploy=self.deploy, dtype=self.dtype,
                    name="rep_l")(e4, train),
        ]

        outs = []
        no = self.num_anchor * (5 + self.num_class)
        for i, (f, s) in enumerate(zip(outs_feats, (8, 16, 32))):
            f = ImplicitAdd(dtype=self.dtype, name=f"ia_{i}")(f)
            f = nn.Conv(
                no, (1, 1), kernel_init=KAIMING,
                bias_init=_v7_detect_bias(s, self.num_class, self.num_anchor),
                dtype=self.dtype, name=f"detect_{i}",
            )(f)
            f = ImplicitMul(dtype=self.dtype, name=f"im_{i}")(f)
            outs.append(f)
        return outs
