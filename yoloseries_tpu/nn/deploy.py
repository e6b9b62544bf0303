"""Deploy-time graph folding: conv+BN fusion and RepConv reparameterization.

The reference mutates torch modules in place (fuse_conv_bn
utils/layer_tools.py:26-53, RepConv.switch_to_deploy :314-416, invoked from
detect_yolov5.py:110-117 and YOLOV7 fuseforward). In JAX the network is a
pure function of a params pytree, so folding is a pytree -> pytree
transform: BN running stats are absorbed into the preceding conv's kernel
and a new bias, and BN becomes identity (scale 1, bias 0, mean 0, var 1).

NB: under XLA the fusion is a latency optimization only for exports —
jit already fuses BN affine into the conv at compile time; folding is
kept for (a) checkpoint export parity with the reference's deploy mode
and (b) removing BN state entirely for serving binaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fold_conv_bn",
    "fold_repconv",
    "fold_repconv_params",
    "fold_stem_to_s2d",
    "fold_stem_from_s2d",
    "stem_kernel_to_s2d",
    "stem_kernel_from_s2d",
]


def _fold_one(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-3):
    """Fold BN(y) over conv(x; kernel) -> new (kernel, bias).

    kernel: (kh, kw, cin, cout) NHWC conv kernel; BN params are (cout,).
    """
    std = jnp.sqrt(bn_var + eps)
    factor = bn_scale / std  # (cout,)
    new_kernel = kernel * factor[None, None, None, :]
    new_bias = bn_bias - bn_mean * factor
    return new_kernel, new_bias


def fold_conv_bn(params, batch_stats, eps=1e-3):
    """Fold every {conv, bn} ConvBnAct-style pair in the tree.

    Walks the params tree; wherever a module dict holds both a 'conv' kernel
    and a sibling 'bn' (flax BatchNorm: scale/bias + batch_stats mean/var),
    the running stats are absorbed into the conv kernel. Because ConvBnAct
    convs carry no bias parameter (use_bias=False), the folded bias lands in
    the BN affine instead: scale=1, bias=folded, mean=0, var=1-eps — i.e.
    the BN degenerates to "+bias". Module definitions stay unchanged.

    Returns (new_params, new_batch_stats). Layers that don't follow the
    {conv, bn} naming convention are left untouched.
    """

    def walk(p, s):
        if not isinstance(p, dict):
            return p, s
        new_p = {}
        new_s = dict(s) if isinstance(s, dict) else s
        for key, val in p.items():
            sub_s = s.get(key, {}) if isinstance(s, dict) else {}
            np_, ns_ = walk(val, sub_s)
            new_p[key] = np_
            if isinstance(new_s, dict) and key in new_s:
                new_s[key] = ns_
        conv = new_p.get("conv")
        bn = new_p.get("bn")
        stats = new_s.get("bn") if isinstance(new_s, dict) else None
        if (
            isinstance(conv, dict) and "kernel" in conv and "bias" not in conv
            and isinstance(bn, dict) and "scale" in bn
            and isinstance(stats, dict) and "mean" in stats
        ):
            kernel, bias = _fold_one(
                conv["kernel"], bn["scale"], bn["bias"], stats["mean"],
                stats["var"], eps,
            )
            new_p["conv"] = {**conv, "kernel": kernel}
            new_p["bn"] = {
                "scale": jnp.ones_like(bn["scale"]),
                "bias": bias,
            }
            new_s["bn"] = {
                "mean": jnp.zeros_like(stats["mean"]),
                "var": jnp.ones_like(stats["var"]) - eps,
            }
        return new_p, new_s

    p_dict = jax.tree.map(lambda x: x, params)  # shallow copy leaves
    return walk(dict(p_dict), dict(batch_stats) if batch_stats else {})


def fold_repconv_params(rep_params, rep_stats, eps=1e-3):
    """Fold a RepConv's 3 branches into one 3x3 conv (kernel, bias).

    rep_params/rep_stats: the module dicts of one RepConv (keys
    rbr_dense_conv/bn, rbr_1x1_conv/bn, optional rbr_identity_bn).
    Returns (kernel (3,3,cin,cout), bias (cout,)) — equivalent single conv,
    the same algebra as RepVGG's get_equivalent_kernel_bias
    (utils/layer_tools.py:314-416).
    """
    k3, b3 = _fold_one(
        rep_params["rbr_dense_conv"]["kernel"],
        rep_params["rbr_dense_bn"]["scale"],
        rep_params["rbr_dense_bn"]["bias"],
        rep_stats["rbr_dense_bn"]["mean"],
        rep_stats["rbr_dense_bn"]["var"],
        eps,
    )
    k1, b1 = _fold_one(
        rep_params["rbr_1x1_conv"]["kernel"],
        rep_params["rbr_1x1_bn"]["scale"],
        rep_params["rbr_1x1_bn"]["bias"],
        rep_stats["rbr_1x1_bn"]["mean"],
        rep_stats["rbr_1x1_bn"]["var"],
        eps,
    )
    # pad 1x1 -> 3x3 (center tap)
    k1_padded = jnp.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))
    kernel = k3 + k1_padded
    bias = b3 + b1

    if "rbr_identity_bn" in rep_params:
        bn = rep_params["rbr_identity_bn"]
        st = rep_stats["rbr_identity_bn"]
        cin = kernel.shape[2]
        cout = kernel.shape[3]
        assert cin == cout
        ident = np.zeros((3, 3, cin, cout), dtype=np.float32)
        for c in range(cin):
            ident[1, 1, c, c] = 1.0
        ki, bi = _fold_one(
            jnp.asarray(ident), bn["scale"], bn["bias"], st["mean"], st["var"], eps
        )
        kernel = kernel + ki
        bias = bias + bi
    return kernel, bias


def fold_repconv(params, batch_stats, eps=1e-3):
    """Reparameterize every RepConv in the tree for ``deploy=True`` modules.

    Walks the params tree; every module dict holding the 3-branch RepConv
    parameter layout (``rbr_dense_conv`` + ``rbr_1x1_conv``) is replaced by
    ``{"rbr_reparam": {"kernel", "bias"}}`` — the single biased conv the
    deploy-mode RepConv expects — and its BN running stats are removed. The
    reference's in-place ``switch_to_deploy`` (utils/layer_tools.py:390-416,
    invoked from YOLOV7Baseline.fuseforward, models/normal/yolov7.py:460-464)
    expressed as a pytree transform.

    Returns (new_params, new_batch_stats) for a model built with
    ``deploy=True`` (e.g. ``YOLOv7(..., deploy=True)``).
    """

    def walk(p, s):
        if not isinstance(p, dict):
            return p, s
        if "rbr_dense_conv" in p and "rbr_1x1_conv" in p:
            kernel, bias = fold_repconv_params(p, s, eps)
            return {"rbr_reparam": {"kernel": kernel, "bias": bias}}, None
        new_p, new_s = {}, {}
        for key, val in p.items():
            sub_s = s.get(key, {}) if isinstance(s, dict) else {}
            np_, ns_ = walk(val, sub_s)
            new_p[key] = np_
            if ns_ is not None and ns_ != {}:
                new_s[key] = ns_
        # keep stats subtrees with no params sibling untouched (BN running
        # stats live under the same module names but their mean/var leaves
        # have no params counterpart)
        if isinstance(s, dict):
            for key, val in s.items():
                if key not in new_s and key not in p:
                    new_s[key] = val
        return new_p, new_s

    new_params, new_stats = walk(dict(params),
                                 dict(batch_stats) if batch_stats else {})
    return new_params, new_stats


def stem_kernel_to_s2d(k6: jnp.ndarray) -> jnp.ndarray:
    """Map a 6x6/stride-2 stem kernel to the equivalent 3x3/stride-1 kernel
    over a space_to_depth2 input (models/yolov5.py:space_to_depth2).

    Derivation: output row y of the 6x6/s2 conv (padding 2) reads input rows
    2y + ky - 2, ky in 0..5. Writing ky = 2*ky' + dy (ky' in 0..2,
    dy in {0, 1}) gives rows 2*(y + ky' - 1) + dy — i.e. row (y + ky' - 1)
    of the space-to-depth tensor at block offset dy: a 3x3/s1 conv with
    padding 1. The s2d channel order is (dy, dx, c), so
    W3[ky', kx', (dy, dx, c)] = W6[2*ky' + dy, 2*kx' + dx, c]. Exact,
    including zero-padding at the borders.
    """
    kh, kw, cin, cout = k6.shape
    if (kh, kw) != (6, 6):
        raise ValueError(f"expected a 6x6 stem kernel, got {(kh, kw)}")
    k = k6.reshape(3, 2, 3, 2, cin, cout)  # (ky', dy, kx', dx, c, o)
    k = k.transpose(0, 2, 1, 3, 4, 5)      # (ky', kx', dy, dx, c, o)
    return k.reshape(3, 3, 4 * cin, cout)


def stem_kernel_from_s2d(k3: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`stem_kernel_to_s2d` (for exporting back to the
    reference's 6x6 layout, e.g. torch-checkpoint round trips)."""
    kh, kw, cin4, cout = k3.shape
    if (kh, kw) != (3, 3) or cin4 % 4:
        raise ValueError(f"expected a 3x3 s2d stem kernel, got {k3.shape}")
    cin = cin4 // 4
    k = k3.reshape(3, 3, 2, 2, cin, cout)  # (ky', kx', dy, dx, c, o)
    k = k.transpose(0, 2, 1, 3, 4, 5)      # (ky', dy, kx', dx, c, o)
    return k.reshape(6, 6, cin, cout)


def fold_stem_to_s2d(params):
    """Convert a params pytree for the standard 6x6-stem model into one for
    the same model constructed with ``s2d_stem=True`` (and vice-versa is
    :func:`fold_stem_from_s2d`). Only the stem conv kernel changes; BN and
    every other leaf are shared as-is."""
    return _map_stem_kernel(params, stem_kernel_to_s2d, want_kh=6)


def fold_stem_from_s2d(params):
    return _map_stem_kernel(params, stem_kernel_from_s2d, want_kh=3)


def _map_stem_kernel(params, fn, want_kh):
    def walk(p):
        if not isinstance(p, dict):
            return p
        new = {k: walk(v) for k, v in p.items()}
        stem = new.get("stem")
        if isinstance(stem, dict):
            conv = stem.get("conv")
            if (
                isinstance(conv, dict)
                and "kernel" in conv
                and conv["kernel"].ndim == 4
                and conv["kernel"].shape[0] == want_kh
            ):
                new["stem"] = {
                    **stem,
                    "conv": {**conv, "kernel": fn(conv["kernel"])},
                }
        return new

    return walk(dict(params))
