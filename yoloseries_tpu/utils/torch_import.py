"""Torch -> flax weight import for ALL six reference families.

Lets users of the reference (yl-jiang/YOLOSeries) bring their trained
weights across: maps the reference module names onto this framework's param
trees, transposing conv kernels from torch's (out, in, kh, kw) to flax's
(kh, kw, in, out) and splitting BatchNorm into params (scale/bias) and
batch_stats (mean/var); GroupNorm maps to params only.

Name-layout sources:
* yolov5 s/m/l/x: models/normal/yolov5s.py:16-44 (identical across sizes),
* yolox s/m/l: models/normal/yolox_s.py:12-171 (v5 trunk under 'neck.' +
  decoupled 'detect.pred_*' heads),
* yolov7: models/normal/yolov7.py:11-406 (hand-unrolled ELAN convN names,
  RepConv branches, Implicit params),
* yolov8: models/normal/yolov8.py:9-124 (C2f conv1/conv2/block.N names,
  split bbox/cls detect towers),
* retinanet(+experiment): models/normal/retinanet.py:7-92 +
  utils/layer_tools.py:555-818 (torchvision-style layerL.B names),
* fcos: models/normal/fcos.py:27-259 (GroupNorm ResNet + shared head).

Also the backbone of the logit-parity tests (tests/test_torch_parity*.py):
a randomly initialized reference model and the converted flax model must
produce identical raw maps.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "convert_yolov5_state_dict",
    "convert_yolox_state_dict",
    "convert_yolov7_state_dict",
    "convert_yolov8_state_dict",
    "convert_retinanet_state_dict",
    "convert_fcos_state_dict",
]

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
        # np.array(copy=True): .numpy() SHARES storage with the live torch
        # tensor — a view here lets later in-place torch training mutate
        # the "converted" tree (bit the trajectory oracle)
        return np.array(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v,
            copy=True,
        )

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


# --------------------------------------------------------------- shared bits

def _as_np(v):
    # np.array(copy=True): .numpy() SHARES storage with the live torch
    # tensor — a view here lets later in-place torch training mutate
    # the "converted" tree (bit the trajectory oracle)
    return np.array(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                    copy=True)


def _kernel(v):
    """torch (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    return _as_np(v).transpose(2, 3, 1, 0)


def _put_convbn(params, stats, path, inner, leaf, value):
    """Route one ConvBnAct leaf: `inner` is 'conv' or 'bn'."""
    if inner == "conv":
        _set(params, path + ["conv", "kernel"], _kernel(value))
    elif inner == "bn":
        if leaf == "weight":
            _set(params, path + ["bn", "scale"], _as_np(value))
        elif leaf == "bias":
            _set(params, path + ["bn", "bias"], _as_np(value))
        elif leaf == "running_mean":
            _set(stats, path + ["bn", "mean"], _as_np(value))
        elif leaf == "running_var":
            _set(stats, path + ["bn", "var"], _as_np(value))
        else:
            raise KeyError(f"unrecognized bn leaf {leaf}")
    else:
        raise KeyError(f"unrecognized ConvBnAct inner {inner}")


def _put_plain_bn(params, stats, path, leaf, value):
    """A bare nn.BatchNorm2d module (no conv wrapper)."""
    if leaf == "weight":
        _set(params, path + ["scale"], _as_np(value))
    elif leaf == "bias":
        _set(params, path + ["bias"], _as_np(value))
    elif leaf == "running_mean":
        _set(stats, path + ["mean"], _as_np(value))
    elif leaf == "running_var":
        _set(stats, path + ["var"], _as_np(value))
    else:
        raise KeyError(f"unrecognized plain-bn leaf {leaf}")


def _put_gn(params, path, leaf, value):
    if leaf == "weight":
        _set(params, path + ["scale"], _as_np(value))
    elif leaf == "bias":
        _set(params, path + ["bias"], _as_np(value))
    else:
        raise KeyError(f"unrecognized gn leaf {leaf}")


def _put_conv_bias(params, path, leaf, value):
    """Plain nn.Conv2d with bias."""
    if leaf == "weight":
        _set(params, path + ["kernel"], _kernel(value))
    elif leaf == "bias":
        _set(params, path + ["bias"], _as_np(value))
    else:
        raise KeyError(f"unrecognized conv leaf {leaf}")


# ----------------------------------------------------------------- YOLOX s/m/l

def convert_yolox_state_dict(state_dict, num_class: int):
    """Reference YOLOXSmall/Middle/Large (models/normal/yolox_s.py:12-171)
    -> our YOLOX tree: the v5 CSPTrunk mapping under 'neck.' plus the
    decoupled heads detect.pred_{small,middle,large} -> head{0,1,2} with
    {stem -> stem, cls.0 -> cls_tower0, conv.0 -> reg_tower0, cls.1 -> cls,
    reg -> reg, cof -> cof} (shared conv tower feeds reg AND cof in the
    reference, mirrored exactly by our reg_tower)."""
    params: dict = {}
    stats: dict = {}
    head_names = {"pred_small": "head0", "pred_middle": "head1", "pred_large": "head2"}

    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        if name.startswith("neck."):
            # v5 trunk layout, same names as yolov5s minus the prefix
            sub = name[len("neck."):]
            matched = None
            for prefix, (_, our) in _V5_PREFIX.items():
                if sub.startswith(prefix + ".") and not prefix.startswith("detect"):
                    matched = (prefix, our)
                    break
            if matched is None:
                raise KeyError(f"unmapped yolox trunk parameter: {name}")
            prefix, our = matched
            rest = sub[len(prefix) + 1:].split(".")
            path = ["trunk", our]
            i = 0
            while i < len(rest) - 2:
                part = rest[i]
                if part == "blocks":
                    path.append(f"block{rest[i + 1]}")
                    i += 2
                    continue
                path.append(_LEAF.get(part, part))
                i += 1
            _put_convbn(params, stats, path, rest[-2], rest[-1], value)
        elif name.startswith("detect."):
            rest = name[len("detect."):].split(".")
            head = head_names[rest[0]]
            if rest[1] == "stem":
                _put_convbn(params, stats, [head, "stem"], rest[2], rest[3], value)
            elif rest[1] == "cls" and rest[2] == "0":
                _put_convbn(params, stats, [head, "cls_tower0"], rest[3], rest[4], value)
            elif rest[1] == "conv" and rest[2] == "0":
                _put_convbn(params, stats, [head, "reg_tower0"], rest[3], rest[4], value)
            elif rest[1] == "cls" and rest[2] == "1":
                _put_conv_bias(params, [head, "cls"], rest[3], value)
            elif rest[1] in ("reg", "cof"):
                _put_conv_bias(params, [head, rest[1]], rest[2], value)
            else:
                raise KeyError(f"unmapped yolox detect parameter: {name}")
        else:
            raise KeyError(f"unmapped yolox parameter: {name}")
    return params, stats


# ------------------------------------------------------------------- YOLOv7

def _v7_elan_leaf(conv_idx: int, first: int):
    """Map reference ELAN convN (N starting at `first`) onto our ELAN
    submodule names cv1, cv2, cv3..cv6, cv_out (6 taps + out)."""
    order = ["cv1", "cv2", "cv3", "cv4", "cv5", "cv6", "cv_out"]
    return order[conv_idx - first]


def convert_yolov7_state_dict(state_dict, num_class: int):
    """Reference YOLOV7Baseline (models/normal/yolov7.py:11-406) -> our
    YOLOv7 tree. The reference hand-unrolls every ELAN as convN modules;
    the correspondence (established from BaselineBackbone.forward:83-155 /
    BaselineHead.forward:231-337) is:

    * backbone stage2: conv1 -> b2_down; conv2..conv8 -> b2_elan cv1..cv_out
    * backbone stages 3-5: conv1 -> b{s}_down.mp_cv, conv2 -> .cv1,
      conv3 -> .cv2; conv4..conv10 -> b{s}_elan cv1..cv_out
    * head_spp.cbaN -> spp.cvN (CSPCSPP is 1:1 by number)
    * head eelan1/2: conv1 -> h{i}_lat, conv2 -> h{i}_route,
      conv3..conv9 -> h{i}_elan cv1..cv_out
    * head eelan3/4: conv1 -> h{i}_down.mp_cv, conv2 -> .cv1, conv3 -> .cv2,
      conv4..conv10 -> h{i}_elan cv1..cv_out
    * head_output_repconvN -> rep_{s,m,l} (rbr_dense.0/.1 ->
      rbr_dense_conv/_bn etc.)
    * detect_{s,m,l} -> detect_{0,1,2}; implicit{add,mul}_{s,m,l}.params
      (1, C, 1, 1) -> ia_/im_{0,1,2}.implicit (1, 1, 1, C).
    """
    params: dict = {}
    stats: dict = {}

    rep_map = {"head_output_repconv1": "rep_s",
               "head_output_repconv2": "rep_m",
               "head_output_repconv3": "rep_l"}
    rep_leaf = {("rbr_dense", "0"): ("conv", "rbr_dense_conv"),
                ("rbr_dense", "1"): ("bn", "rbr_dense_bn"),
                ("rbr_1x1", "0"): ("conv", "rbr_1x1_conv"),
                ("rbr_1x1", "1"): ("bn", "rbr_1x1_bn"),
                ("rbr_identity", ""): ("bn", "rbr_identity_bn")}

    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        parts = name.split(".")
        scope, mod = parts[0], parts[1]

        if scope == "backbone":
            if mod == "stem":
                _put_convbn(params, stats, ["stem"], parts[2], parts[3], value)
                continue
            # backbone_stage{s}_conv{n}
            stage = int(mod[len("backbone_stage")])
            n = int(mod.split("conv")[1])
            if stage == 1:
                path = [f"b1_cv{n}"]
            elif stage == 2:
                path = ["b2_down"] if n == 1 else ["b2_elan", _v7_elan_leaf(n, 2)]
            else:
                down = {1: "mp_cv", 2: "cv1", 3: "cv2"}
                if n <= 3:
                    path = [f"b{stage}_down", down[n]]
                else:
                    path = [f"b{stage}_elan", _v7_elan_leaf(n, 4)]
            _put_convbn(params, stats, path, parts[2], parts[3], value)

        elif scope == "head":
            if mod == "head_spp":
                cv = parts[2].replace("cba", "cv")
                _put_convbn(params, stats, ["spp", cv], parts[3], parts[4], value)
            elif mod.startswith("head_eelan"):
                i = int(mod[len("head_eelan")])
                n = int(mod.split("conv")[1])
                if i in (1, 2):
                    if n == 1:
                        path = [f"h{i}_lat"]
                    elif n == 2:
                        path = [f"h{i}_route"]
                    else:
                        path = [f"h{i}_elan", _v7_elan_leaf(n, 3)]
                else:
                    down = {1: "mp_cv", 2: "cv1", 3: "cv2"}
                    if n <= 3:
                        path = [f"h{i}_down", down[n]]
                    else:
                        path = [f"h{i}_elan", _v7_elan_leaf(n, 4)]
                _put_convbn(params, stats, path, parts[2], parts[3], value)
            elif mod in rep_map:
                our = rep_map[mod]
                branch = parts[2]
                idx = parts[3] if branch != "rbr_identity" else ""
                kind, leaf_name = rep_leaf[(branch, idx)]
                rest_leaf = parts[-1]
                if kind == "conv":
                    _set(params, [our, leaf_name, "kernel"], _kernel(value))
                else:
                    _put_plain_bn(params, stats, [our, leaf_name], rest_leaf, value)
            else:
                raise KeyError(f"unmapped yolov7 head parameter: {name}")

        elif scope == "detect":
            idx = {"s": "0", "m": "1", "l": "2"}
            if mod.startswith("detect_"):
                _put_conv_bias(params, [f"detect_{idx[mod[-1]]}"], parts[2], value)
            elif mod.startswith("implicitadd_"):
                _set(params, [f"ia_{idx[mod[-1]]}", "implicit"],
                     _as_np(value).transpose(0, 2, 3, 1))
            elif mod.startswith("implicitmul_"):
                _set(params, [f"im_{idx[mod[-1]]}", "implicit"],
                     _as_np(value).transpose(0, 2, 3, 1))
            else:
                raise KeyError(f"unmapped yolov7 detect parameter: {name}")
        else:
            raise KeyError(f"unmapped yolov7 parameter: {name}")
    return params, stats


# ------------------------------------------------------------------- YOLOv8

_V8_TRUNK = {
    "backbone_stem1": "stem1",
    "backbone_stem2": "stem2",
    "backbone_stage1_c2f": "b1_c2f",
    "backbone_stage1_conv": "b1_conv",
    "backbone_stage2_c2f": "b2_c2f",
    "backbone_stage2_conv": "b2_conv",
    "backbone_stage3_c2f": "b3_c2f",
    "backbone_stage3_conv": "b3_conv",
    "backbone_stage4_c2f": "b4_c2f",
    "backbone_stage4_spp": "b4_spp",
    "head_stage1_c2f1": "h1_c2f",
    "head_stage2_c2f1": "h2_c2f",
    "head_stage3_c2f1": "h3_c2f",
    "head_stage3_conv": "h3_conv",
    "head_stage3_c2f2": "h3_c2f2",
    "head_stage2_conv": "h2_conv",
    "head_stage2_c2f2": "h2_c2f2",
    "head_stage1_conv": "h1_conv",
    "head_stage1_c2f2": "h1_c2f2",
}

_V8_HEADS = {"xsmall": "head0", "small": "head1", "mid": "head2", "large": "head3"}


def convert_yolov8_state_dict(state_dict, num_class: int):
    """Reference YOLOV8 (models/normal/yolov8.py:86-182) -> our YOLOv8 tree.
    C2f inner names: conv1 -> cv1, conv2 -> cv2, block.N.convM -> blockN.cvM;
    detect towers detect_{scale}_{bbox,cls}.{0,1,2} ->
    head{i}.{box1,box2,box_out} / {cls1,cls2,cls_out}."""
    params: dict = {}
    stats: dict = {}

    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        parts = name.split(".")
        mod = parts[0]

        if mod in _V8_TRUNK:
            path = [_V8_TRUNK[mod]]
            rest = parts[1:]
            i = 0
            while i < len(rest) - 2:
                part = rest[i]
                if part == "block":
                    path.append(f"block{rest[i + 1]}")
                    i += 2
                    continue
                path.append(
                    {"conv1": "cv1", "conv2": "cv2",
                     "cba1": "cv1", "cba2": "cv2"}.get(part, part)
                )
                i += 1
            _put_convbn(params, stats, path, rest[-2], rest[-1], value)
        elif mod == "detect":
            # detect_{scale}_{bbox|cls}.{idx}...
            sub = parts[1]  # e.g. detect_xsmall_bbox
            _, scale, branch = sub.split("_")
            head = _V8_HEADS[scale]
            idx = parts[2]
            ours = {"bbox": ("box1", "box2", "box_out"),
                    "cls": ("cls1", "cls2", "cls_out")}[branch][int(idx)]
            if idx == "2":
                _put_conv_bias(params, [head, ours], parts[3], value)
            else:
                _put_convbn(params, stats, [head, ours], parts[3], parts[4], value)
        else:
            raise KeyError(f"unmapped yolov8 parameter: {name}")
    return params, stats


# ---------------------------------------------------------------- RetinaNet

def convert_retinanet_state_dict(state_dict, num_class: int):
    """Reference RetinaNet(+experiment) (models/normal/retinanet.py:7-92,
    towers utils/layer_tools.py:703-818) -> our RetinaNet tree."""
    params: dict = {}
    stats: dict = {}

    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        parts = name.split(".")
        scope = parts[0]
        if scope == "backbone":
            mod = parts[1]
            if mod == "conv1":
                _set(params, ["backbone", "stem_conv", "kernel"], _kernel(value))
            elif mod == "bn1":
                _put_plain_bn(params, stats, ["backbone", "stem_bn"], parts[2], value)
            else:  # layerL.B.*
                block = f"{mod}_{parts[2]}"
                inner = parts[3]
                if inner.startswith("conv"):
                    _set(params, ["backbone", block, inner, "kernel"], _kernel(value))
                elif inner.startswith("bn"):
                    _put_plain_bn(params, stats, ["backbone", block, inner],
                                  parts[4], value)
                elif inner == "downsample":
                    sub, leaf = parts[4], parts[5] if len(parts) > 5 else None
                    if sub == "0":
                        _set(params, ["backbone", block, "down_conv", "kernel"],
                             _kernel(value))
                    else:  # downsample.1 = bn
                        _put_plain_bn(params, stats,
                                      ["backbone", block, "down_bn"], leaf, value)
                else:
                    raise KeyError(f"unmapped retinanet backbone: {name}")
        elif scope == "fpn":
            _put_conv_bias(params, ["fpn", parts[1]], parts[2], value)
        elif scope in ("classification", "regression"):
            mod = "out" if parts[1] == "output" else parts[1]
            _put_conv_bias(params, [scope, mod], parts[2], value)
        else:
            raise KeyError(f"unmapped retinanet parameter: {name}")
    return params, stats


# --------------------------------------------------------------------- FCOS

def convert_fcos_state_dict(state_dict, num_class: int):
    """Reference FCOSBaseline with norm_layer_type='group_norm'
    (models/normal/fcos.py:261-325) -> our FCOS tree. The reference names
    its GN modules 'bnN' — they carry only weight/bias (no running stats)."""
    params: dict = {}
    stats: dict = {}

    for name, value in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        parts = name.split(".")
        scope = parts[0]
        if scope == "backbone":
            mod = parts[1]
            if mod == "conv1":
                _set(params, ["backbone", "stem_conv", "kernel"], _kernel(value))
            elif mod == "bn1":
                _put_gn(params, ["backbone", "stem_gn"], parts[2], value)
            else:  # layerL.B.*
                block = f"{mod}_{parts[2]}"
                inner = parts[3]
                if inner.startswith("conv"):
                    _set(params, ["backbone", block, inner, "kernel"], _kernel(value))
                elif inner.startswith("bn"):
                    _put_gn(params, ["backbone", block,
                                     inner.replace("bn", "gn")], parts[4], value)
                elif inner == "downsample":
                    if parts[4] == "0":
                        _set(params, ["backbone", block, "down_conv", "kernel"],
                             _kernel(value))
                    else:
                        _put_gn(params, ["backbone", block, "down_gn"],
                                parts[5], value)
                else:
                    raise KeyError(f"unmapped fcos backbone: {name}")
        elif scope == "fpn":
            _put_conv_bias(params, ["fpn", parts[1]], parts[2], value)
        elif scope == "head":
            mod = parts[1]
            if mod in ("cls_layers", "reg_layers"):
                i = parts[2]
                kind = "cls" if mod == "cls_layers" else "reg"
                if parts[3] == "0":  # conv (no bias)
                    _set(params, ["head", f"{kind}_conv{i}", "kernel"],
                         _kernel(value))
                else:  # GroupNorm
                    _put_gn(params, ["head", f"{kind}_gn{i}"], parts[4], value)
            elif mod in ("cls_out_layer", "reg_out_layer", "ctr_out_layer"):
                _put_conv_bias(params, ["head", mod.replace("_layer", "")],
                               parts[2], value)
            elif mod == "scales":
                _set(params, ["head", f"scale{parts[2]}", "scale"],
                     _as_np(value).reshape(()))
            else:
                raise KeyError(f"unmapped fcos head parameter: {name}")
        else:
            raise KeyError(f"unmapped fcos parameter: {name}")
    return params, stats
