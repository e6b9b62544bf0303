"""flax.linen layer zoo, NHWC, bf16-ready.

Rebuilds the reference layer vocabulary (utils/layer_tools.py) TPU-first:

* NHWC everywhere (XLA:TPU's native conv layout),
* BatchNorm carried as flax batch_stats collections (eps 1e-3; torch
  momentum 0.03 == flax momentum 0.97), with TORCH accumulation semantics
  (unbiased running var — see TorchBatchNorm), per-replica under data
  parallelism with an explicit pre-eval pmean sync (matching
  utils/allreduce_norm.py semantics rather than sync-BN),
* a ``dtype`` knob for bfloat16 compute with float32 params/stats,
* RepConv carries its 3 train-time branches; the reparam fold to a single
  conv is a pure pytree-to-pytree transform (`fold_repconv`, export path),
  unlike torch's in-place module surgery.

Reference layers: ConvBnAct:82, BasicBottleneck:97, BottleneckCSP:117,
C3BottleneckCSP:152, SE:172/213, Focus:231, SPP:248, FastSPP:270,
CSPCSPP:290, RepConv:314, ImplicitAdd/Mul:422, Detect:454, DW variants:475,
ELANBlock:823, C2f:872, DistributionFocalLoss integral:906, Scale:56.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "TorchBatchNorm",
    "ConvBnAct",
    "BasicBottleneck",
    "BottleneckCSP",
    "C3BottleneckCSP",
    "SqueezeExcitation",
    "SEBottleneckCSP",
    "Focus",
    "SPP",
    "FastSPP",
    "CSPCSPP",
    "RepConv",
    "ImplicitAdd",
    "ImplicitMul",
    "Scale",
    "C2f",
    "ELANBlock",
    "DetectHead",
    "upsample2x",
    "max_pool_same",
    "dfl_integral",
]

Dtype = Any

KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def autopad(kernel: int, padding: int | None) -> int:
    return kernel // 2 if padding is None else padding


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample, NHWC (replaces nn.Upsample)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def max_pool_same(x: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """stride-1 max pool with SAME padding (SPP building block)."""
    return nn.max_pool(
        x, (kernel, kernel), strides=(1, 1), padding=((kernel // 2,) * 2,) * 2
    )


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch.nn.BatchNorm2d ACCUMULATION semantics.

    Differs from flax nn.BatchNorm in exactly one way: the running variance
    accumulates the UNBIASED batch variance (Bessel n/(n-1) correction,
    pytorch _BatchNorm convention) while normalization itself still uses the
    biased variance — flax accumulates the biased one. The drift is n/(n-1)
    per update on the var leaves (≈6% at a 3x3 deep-stage grid with B=2);
    caught by tests/test_trajectory_oracle.py batch_stats parity and it
    matters for torch-checkpoint round trips (utils/torch_import.py).

    ``momentum`` follows the FLAX convention (running-average decay; torch
    momentum 0.03 == 0.97 here) so call sites read like nn.BatchNorm.
    Collections/param names match flax ('batch_stats' mean/var, params
    scale/bias) — checkpoint- and fold_conv_bn-compatible.
    """

    use_running_average: bool
    momentum: float = 0.97
    epsilon: float = 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            # fast variance (mean of squares), like flax's default; stats
            # sit near 0-mean activations so cancellation is benign
            var = jnp.maximum(jnp.mean(jnp.square(xf), axes) - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = x.size // feat
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * (var * bessel)
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        shift = bias - mean * mul
        return x * mul.astype(self.dtype) + shift.astype(self.dtype)


class ConvBnAct(nn.Module):
    """Conv (no bias) + BatchNorm(eps 1e-3, torch-momentum 0.03) + SiLU."""

    out_channels: int
    kernel: int = 1
    stride: int = 1
    padding: int | None = None
    groups: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.kernel, self.padding)
        x = nn.Conv(
            self.out_channels,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=False,
            kernel_init=KAIMING,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.silu(x) if self.act else x


class DWConvBnAct(nn.Module):
    """Depthwise 3x3 (+BN+act) then pointwise ConvBnAct — the reference's
    DepthWiseConvBnAct (utils/layer_tools.py:475-500)."""

    out_channels: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = ConvBnAct(
            in_ch, self.kernel, self.stride, groups=in_ch, dtype=self.dtype,
            name="dw",
        )(x, train)
        x = ConvBnAct(self.out_channels, 1, 1, dtype=self.dtype, name="pw")(x, train)
        return x


class BasicBottleneck(nn.Module):
    """kernels[0] -> kernels[1] conv pair with optional residual
    (utils/layer_tools.py:97-114; default (1, 3)). With kernels=(3, 3) this
    is the reference's ConciseBottleneck (utils/layer_tools.py:872-884), the
    C2f inner block."""

    out_channels: int
    shortcut: bool = True
    groups: int = 1
    expand_ratio: float = 0.5
    kernels: tuple[int, int] = (1, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = int(in_ch * self.expand_ratio)
        y = ConvBnAct(mid, self.kernels[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBnAct(
            self.out_channels, self.kernels[1], 1, groups=self.groups,
            dtype=self.dtype, name="cv2",
        )(y, train)
        if self.shortcut and in_ch == self.out_channels:
            y = y + x
        return y


class C3BottleneckCSP(nn.Module):
    """CSP block with 3 convs (utils/layer_tools.py:152-170)."""

    out_channels: int
    shortcut: bool = True
    num_blocks: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_channels // 2
        y1 = ConvBnAct(mid, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.num_blocks):
            y1 = BasicBottleneck(
                mid, self.shortcut, expand_ratio=1.0, dtype=self.dtype,
                name=f"block{i}",
            )(y1, train)
        y2 = ConvBnAct(mid, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBnAct(self.out_channels, 1, 1, dtype=self.dtype, name="cv3")(
            y, train
        )


class BottleneckCSP(nn.Module):
    """Plain BottleneckCSP with raw-conv side path + LeakyReLU fuse
    (utils/layer_tools.py:117-149) — used by yolov5s_plain_bscp."""

    out_channels: int
    shortcut: bool = True
    num_blocks: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_channels // 2
        y2 = nn.Conv(
            mid, (1, 1), use_bias=False, kernel_init=KAIMING, dtype=self.dtype,
            name="cv_side",
        )(x)
        y1 = ConvBnAct(mid, 1, 1, padding=0, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.num_blocks):
            y1 = BasicBottleneck(
                mid, self.shortcut, expand_ratio=1.0, dtype=self.dtype,
                name=f"block{i}",
            )(y1, train)
        y1 = nn.Conv(
            mid, (1, 1), use_bias=False, kernel_init=KAIMING, dtype=self.dtype,
            name="cv_mid",
        )(y1)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = TorchBatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(y)
        y = nn.leaky_relu(y, 0.1)
        return ConvBnAct(self.out_channels, 1, 1, dtype=self.dtype, name="cv2")(
            y, train
        )


class SqueezeExcitation(nn.Module):
    """SE block, 1x1 conv gate (utils/layer_tools.py:213-229)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(c, (1, 1), kernel_init=KAIMING, dtype=self.dtype, name="fc")(g)
        return x * jax.nn.sigmoid(g)


class SEBottleneckCSP(nn.Module):
    """BottleneckCSP with an SE gate before the fuse (utils/layer_tools.py:172-210)."""

    out_channels: int
    shortcut: bool = True
    num_blocks: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_channels // 2
        y2 = nn.Conv(
            mid, (1, 1), use_bias=False, kernel_init=KAIMING, dtype=self.dtype,
            name="cv_side",
        )(x)
        y1 = ConvBnAct(mid, 1, 1, padding=0, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.num_blocks):
            y1 = BasicBottleneck(
                mid, self.shortcut, expand_ratio=1.0, dtype=self.dtype,
                name=f"block{i}",
            )(y1, train)
        y1 = nn.Conv(
            mid, (1, 1), use_bias=False, kernel_init=KAIMING, dtype=self.dtype,
            name="cv_mid",
        )(y1)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = SqueezeExcitation(dtype=self.dtype, name="se")(y)
        y = TorchBatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(y)
        y = nn.leaky_relu(y, 0.1)
        return ConvBnAct(self.out_channels, 1, 1, dtype=self.dtype, name="cv2")(
            y, train
        )


class Focus(nn.Module):
    """Space-to-depth stem (utils/layer_tools.py:231-245). The live v5 models
    replace it with a 6x6/2 conv; kept for completeness/compatibility."""

    out_channels: int
    kernel: int = 1
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        return ConvBnAct(
            self.out_channels, self.kernel, self.stride, dtype=self.dtype,
            name="conv",
        )(x, train)


class SPP(nn.Module):
    """Parallel 5/9/13 max-pool pyramid (utils/layer_tools.py:248-268)."""

    out_channels: int
    kernels: Sequence[int] = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 2
        x = ConvBnAct(mid, 1, 1, padding=0, dtype=self.dtype, name="cv1")(x, train)
        pools = [x] + [max_pool_same(x, k) for k in self.kernels]
        x = jnp.concatenate(pools, axis=-1)
        return ConvBnAct(self.out_channels, 1, 1, dtype=self.dtype, name="cv2")(
            x, train
        )


class FastSPP(nn.Module):
    """Chained-5 max-pool SPP (utils/layer_tools.py:270-288)."""

    out_channels: int
    kernel: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 2
        x = ConvBnAct(mid, 1, 1, padding=0, dtype=self.dtype, name="cv1")(x, train)
        x2 = max_pool_same(x, self.kernel)
        x3 = max_pool_same(x2, self.kernel)
        x4 = max_pool_same(x3, self.kernel)
        y = jnp.concatenate([x, x2, x3, x4], axis=-1)
        return ConvBnAct(self.out_channels, 1, 1, dtype=self.dtype, name="cv2")(
            y, train
        )


class CSPCSPP(nn.Module):
    """YOLOv7's CSP-wrapped SPP (utils/layer_tools.py:290-310)."""

    out_channels: int
    kernels: Sequence[int] = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = x.shape[-1] // 2
        p1 = ConvBnAct(mid, 1, 1, padding=0, dtype=self.dtype, name="cv1")(x, train)
        p1 = ConvBnAct(mid, 3, 1, dtype=self.dtype, name="cv3")(p1, train)
        p1 = ConvBnAct(mid, 1, 1, padding=0, dtype=self.dtype, name="cv4")(p1, train)
        pools = [p1] + [max_pool_same(p1, k) for k in self.kernels]
        p1 = jnp.concatenate(pools, axis=-1)
        p1 = ConvBnAct(mid, 1, 1, padding=0, dtype=self.dtype, name="cv5")(p1, train)
        p1 = ConvBnAct(mid, 3, 1, dtype=self.dtype, name="cv6")(p1, train)
        p2 = ConvBnAct(mid, 1, 1, padding=0, dtype=self.dtype, name="cv2")(x, train)
        return ConvBnAct(
            self.out_channels, 1, 1, padding=0, dtype=self.dtype, name="cv7"
        )(jnp.concatenate([p1, p2], axis=-1), train)


class RepConv(nn.Module):
    """Train-time 3-branch RepVGG conv (3x3 + 1x1 + optional identity BN),
    SiLU activation (utils/layer_tools.py:314-416).

    ``deploy=True`` is the reparameterized single-conv form the reference's
    ``switch_to_deploy`` (:390-416) produces: one biased ``rbr_reparam``
    conv whose (kernel, bias) come from ``fold_repconv`` /
    ``fold_repconv_params`` over the 3-branch params pytree.
    """

    out_channels: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    deploy: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        pad = autopad(self.kernel, None)
        identity_ok = in_ch == self.out_channels and self.stride == 1

        if self.deploy:
            y = nn.Conv(
                self.out_channels, (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                feature_group_count=self.groups, use_bias=True,
                kernel_init=KAIMING, dtype=self.dtype, name="rbr_reparam",
            )(x)
            return nn.silu(y) if self.act else y

        dense = nn.Conv(
            self.out_channels, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups, use_bias=False,
            kernel_init=KAIMING, dtype=self.dtype, name="rbr_dense_conv",
        )(x)
        dense = TorchBatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=self.dtype, name="rbr_dense_bn",
        )(dense)

        one = nn.Conv(
            self.out_channels, (1, 1), strides=(self.stride, self.stride),
            padding="VALID", feature_group_count=self.groups, use_bias=False,
            kernel_init=KAIMING, dtype=self.dtype, name="rbr_1x1_conv",
        )(x)
        one = TorchBatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=self.dtype, name="rbr_1x1_bn",
        )(one)

        y = dense + one
        if identity_ok:
            ident = TorchBatchNorm(
                use_running_average=not train, momentum=0.97, epsilon=1e-3,
                dtype=self.dtype, name="rbr_identity_bn",
            )(x)
            y = y + ident
        return nn.silu(y) if self.act else y


class ImplicitAdd(nn.Module):
    """YOLOR learned additive prior (utils/layer_tools.py:422-430)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        p = self.param(
            "implicit", nn.initializers.normal(0.02), (1, 1, 1, c), jnp.float32
        )
        return x + p.astype(x.dtype)


class ImplicitMul(nn.Module):
    """YOLOR learned multiplicative prior (utils/layer_tools.py:433-439)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]

        def init(key, shape, dtype):
            return 1.0 + nn.initializers.normal(0.02)(key, shape, dtype)

        p = self.param("implicit", init, (1, 1, 1, c), jnp.float32)
        return x * p.astype(x.dtype)


class Scale(nn.Module):
    """Single learnable scalar multiplier (utils/layer_tools.py:56-62, FCOS)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param(
            "scale", nn.initializers.constant(self.init_value), (), jnp.float32
        )
        return x * s.astype(x.dtype)


class C2f(nn.Module):
    """YOLOv8's concise CSP block (utils/layer_tools.py:886-903). Inner
    blocks are ConciseBottlenecks: two 3x3 convs (kernel_size=(3, 3) in the
    reference C2f ctor), NOT the default 1x1->3x3 bottleneck."""

    out_channels: int
    shortcut: bool = False
    num_blocks: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_channels // 2
        y = ConvBnAct(2 * mid, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        parts = [y[..., :mid], y[..., mid:]]
        for i in range(self.num_blocks):
            parts.append(
                BasicBottleneck(
                    mid, self.shortcut, expand_ratio=1.0, kernels=(3, 3),
                    dtype=self.dtype, name=f"block{i}",
                )(parts[-1], train)
            )
        y = jnp.concatenate(parts, axis=-1)
        return ConvBnAct(self.out_channels, 1, 1, dtype=self.dtype, name="cv2")(
            y, train
        )


class ELANBlock(nn.Module):
    """YOLOv7 E-ELAN: two 1x1 entries, chained 3x3 pairs, concat-of-4 taps
    (utils/layer_tools.py:823-867)."""

    mid_channels: int
    out_channels: int
    depth: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y1 = ConvBnAct(self.mid_channels, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y2 = ConvBnAct(self.mid_channels, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        taps = [y1, y2]
        y = y2
        for i in range(self.depth):
            y = ConvBnAct(self.mid_channels, 3, 1, dtype=self.dtype, name=f"cv3_{i}a")(
                y, train
            )
            y = ConvBnAct(self.mid_channels, 3, 1, dtype=self.dtype, name=f"cv3_{i}b")(
                y, train
            )
            taps.append(y)
        y = jnp.concatenate(taps[::-1], axis=-1)
        return ConvBnAct(self.out_channels, 1, 1, dtype=self.dtype, name="cv4")(
            y, train
        )


def detect_bias_init(stride: float, num_class: int, num_anchor: int):
    """Detection-head bias prior: obj bias log(8/(512/stride)^2), cls bias
    log(0.6/(nc-0.99)) — models/normal/yolov5s.py:47-85 / RetinaNet paper."""

    def init(key, shape, dtype=jnp.float32):
        del key
        assert shape[0] == num_anchor * (5 + num_class)
        b = jnp.zeros((num_anchor, 5 + num_class), dtype)
        b = b.at[:, 4].set(jnp.log(8.0 / (512.0 / stride) ** 2))
        b = b.at[:, 5:].set(jnp.log(0.6 / (num_class - 0.99)))
        return b.reshape(shape)

    return init


class DetectHead(nn.Module):
    """Per-scale 1x1 conv detection heads (utils/layer_tools.py:454-470).

    Returns one (B, H, W, A*(5+nc)) map per input scale; reshape/activation
    is the loss/decoder's business, keeping this head layout-pure.
    """

    num_class: int
    num_anchor: int = 3
    strides: Sequence[int] = (8, 16, 32)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]):
        assert len(xs) == len(self.strides)
        outs = []
        for i, (x, s) in enumerate(zip(xs, self.strides)):
            out = nn.Conv(
                self.num_anchor * (5 + self.num_class), (1, 1),
                kernel_init=KAIMING,
                bias_init=detect_bias_init(s, self.num_class, self.num_anchor),
                dtype=self.dtype,
                name=f"detect_{i}",
            )(x)
            outs.append(out)
        return outs


def dfl_integral(x: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Distribution Focal Loss integral: softmax over reg_max bins -> expected
    value (utils/layer_tools.py:906-922). x: (..., 4*reg_max) -> (..., 4)."""
    shape = x.shape[:-1]
    x = x.reshape(*shape, 4, reg_max)
    probs = jax.nn.softmax(x, axis=-1)
    bins = jnp.arange(reg_max, dtype=x.dtype)
    return jnp.sum(probs * bins, axis=-1)
