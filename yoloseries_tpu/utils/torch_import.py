"""Torch -> flax weight import for YOLOv5 checkpoints.

Lets users of the reference (yl-jiang/YOLOSeries) bring their trained
YOLOv5 weights across: maps the reference's module names
(models/normal/yolov5s.py:16-44 layout) onto this framework's CSPTrunk +
DetectHead param tree, transposing conv kernels from torch's (out, in, kh,
kw) to flax's (kh, kw, in, out) and splitting BatchNorm into params
(scale/bias) and batch_stats (mean/var).

Also the backbone of the logit-parity test (tests/test_torch_parity.py):
a randomly initialized reference model and the converted flax model must
produce identical raw maps.
"""

from __future__ import annotations

import numpy as np

__all__ = ["convert_yolov5_state_dict"]

# reference module prefix -> (our top module, our submodule)
_V5_PREFIX = {
    "focus": ("trunk", "stem"),
    "backbone_stage1_conv": ("trunk", "b1_conv"),
    "backbone_stage1_bscp": ("trunk", "b1_csp"),
    "backbone_stage2_conv": ("trunk", "b2_conv"),
    "backbone_stage2_bscp": ("trunk", "b2_csp"),
    "backbone_stage3_conv": ("trunk", "b3_conv"),
    "backbone_stage3_bscp": ("trunk", "b3_csp"),
    "backbone_stage4_conv": ("trunk", "b4_conv"),
    "backbone_stage4_bscp": ("trunk", "b4_csp"),
    "backbone_stage4_spp": ("trunk", "b4_spp"),
    "head_stage1_conv": ("trunk", "h1_conv"),
    "head_stage1_bscp": ("trunk", "h1_csp"),
    "head_stage2_conv": ("trunk", "h2_conv"),
    "head_stage2_bscp": ("trunk", "h2_csp"),
    "head_stage3_conv": ("trunk", "h3_conv"),
    "head_stage3_bscp": ("trunk", "h3_csp"),
    "head_stage4_conv": ("trunk", "h4_conv"),
    "head_stage4_bscp": ("trunk", "h4_csp"),
    "detect.detect_small": ("detect", "detect_0"),
    "detect.detect_mid": ("detect", "detect_1"),
    "detect.detect_large": ("detect", "detect_2"),
}

# leaf renames inside ConvBnAct / C3 / FastSPP
_LEAF = {
    "conv_bn_act_1": "cv1",
    "conv_bn_act_2": "cv2",
    "cba1": "cv1",
    "cba2": "cv2",
    "cba3": "cv3",
}


def _set(tree: dict, path: list, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def convert_yolov5_state_dict(state_dict, num_class: int):
    """Torch state_dict (name -> numpy/tensor) -> (params, batch_stats).

    Accepts the raw module state_dict of the reference YOLOV5* models (any
    size — names are identical across s/m/l/x). Tensors may be torch
    tensors or numpy arrays.
    """
    params: dict = {}
    stats: dict = {}

    def as_np(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        value = as_np(value)

        matched = None
        for prefix, (top, sub) in _V5_PREFIX.items():
            if name.startswith(prefix + "."):
                matched = (prefix, top, sub)
                break
        if matched is None:
            raise KeyError(f"unmapped torch parameter: {name}")
        prefix, top, sub = matched
        rest = name[len(prefix) + 1 :].split(".")

        # translate inner path
        path = [top, sub]
        i = 0
        while i < len(rest) - 2:
            part = rest[i]
            if part == "blocks":
                path.append(f"block{rest[i + 1]}")
                i += 2
                continue
            path.append(_LEAF.get(part, part))
            i += 1
        inner = rest[-2] if len(rest) >= 2 else ""
        leaf = rest[-1]

        if top == "detect":
            # plain 1x1 conv with bias
            if leaf == "weight":
                _set(params, path + ["kernel"], value.transpose(2, 3, 1, 0))
            else:
                _set(params, path + ["bias"], value)
            continue

        if inner == "conv":
            _set(params, path + ["conv", "kernel"], value.transpose(2, 3, 1, 0))
        elif inner == "bn":
            if leaf == "weight":
                _set(params, path + ["bn", "scale"], value)
            elif leaf == "bias":
                _set(params, path + ["bn", "bias"], value)
            elif leaf == "running_mean":
                _set(stats, path + ["bn", "mean"], value)
            elif leaf == "running_var":
                _set(stats, path + ["bn", "var"], value)
        else:
            raise KeyError(f"unrecognized leaf in {name}")

    return params, stats
