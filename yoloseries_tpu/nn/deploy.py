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

__all__ = ["fold_conv_bn", "fold_repconv_params"]


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
