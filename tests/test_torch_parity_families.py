"""Logit parity vs the executed reference for the five remaining families
(VERDICT round-1 item 3): yolox_s, yolov7, yolov8, retinanet, fcos.

Pattern (same as test_torch_parity.py's v5 tests): instantiate the reference
torch model with random weights, convert its state_dict through the family
converter, run both on the same input, demand matching raw maps. The
reference code is executed via tests/ref_loader.py — never copied.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
from ref_loader import REFERENCE, load_reference_model  # noqa: E402

pytestmark = [
    pytest.mark.skipif(not REFERENCE.exists(), reason="reference repo not mounted"),
    pytest.mark.slow,
]

RTOL, ATOL = 5e-3, 5e-4


def _check_tree_matches(model, params, size):
    import jax
    import jax.numpy as jnp

    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)),
                      train=False)
    want = {jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_flatten_with_path(init["params"])[0]}
    got = {jax.tree_util.keystr(p) for p, _ in
           jax.tree_util.tree_flatten_with_path(params)[0]}
    assert want == got, (
        f"missing: {sorted(want - got)[:8]} extra: {sorted(got - want)[:8]}"
    )


def _run_pair(ref, model, params, stats, size, seed=0):
    import torch

    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (1, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    ours = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       train=False)
    return ref_out, ours


def test_yolox_s_logit_parity_with_reference():
    import torch

    from yoloseries_tpu.models import create_model
    from yoloseries_tpu.utils.torch_import import convert_yolox_state_dict

    torch.manual_seed(2)
    nc = 6
    ref = load_reference_model("yolox_s")(
        num_anchors=1, in_channel=3, num_classes=nc
    ).eval()
    params, stats = convert_yolox_state_dict(ref.state_dict(), nc)
    model = create_model("yolox_s", num_class=nc)
    _check_tree_matches(model, params, 64)

    ref_out, ours = _run_pair(ref, model, params, stats, 64)
    # reference: OrderedDict pred_s/m/l of (b, na=1, 5+nc, h, w)
    for key, our_o in zip(("pred_s", "pred_m", "pred_l"), ours):
        r = ref_out[key].numpy()  # (1, 1, 5+nc, h, w)
        b, na, c, h, w = r.shape
        r = r.transpose(0, 3, 4, 1, 2).reshape(b, h, w, na * c)
        np.testing.assert_allclose(np.asarray(our_o), r, rtol=RTOL, atol=ATOL)


def test_yolov7_logit_parity_with_reference():
    import torch

    from yoloseries_tpu.models import create_model
    from yoloseries_tpu.utils.torch_import import convert_yolov7_state_dict

    torch.manual_seed(3)
    nc = 6
    ref = load_reference_model("yolov7")(
        num_anchor=3, num_class=nc, in_channel=3
    ).eval()
    params, stats = convert_yolov7_state_dict(ref.state_dict(), nc)
    model = create_model("yolov7", num_class=nc)
    _check_tree_matches(model, params, 64)

    ref_out, ours = _run_pair(ref, model, params, stats, 64)
    # reference: OrderedDict pred_s/m/l of (b, na=3, h, w, 5+nc)
    for key, our_o in zip(("pred_s", "pred_m", "pred_l"), ours):
        r = ref_out[key].numpy()  # (1, 3, h, w, 5+nc)
        b, na, h, w, c = r.shape
        r = r.transpose(0, 2, 3, 1, 4).reshape(b, h, w, na * c)
        np.testing.assert_allclose(np.asarray(our_o), r, rtol=RTOL, atol=ATOL)


def test_yolov8_logit_parity_with_reference():
    import torch

    from yoloseries_tpu.models import create_model
    from yoloseries_tpu.utils.torch_import import convert_yolov8_state_dict

    torch.manual_seed(4)
    nc = 6
    ref = load_reference_model("yolov8")(in_channel=3, num_class=nc, scale=0.5).eval()
    params, stats = convert_yolov8_state_dict(ref.state_dict(), nc)
    model = create_model("yolov8", num_class=nc)  # registry default scale 0.5
    _check_tree_matches(model, params, 64)

    ref_out, ours = _run_pair(ref, model, params, stats, 64)
    # reference: dict pred_xs/x/m/l of (b, 64+nc, h, w) at /4,/8,/16,/32
    for key, our_o in zip(("pred_xs", "pred_x", "pred_m", "pred_l"), ours):
        r = ref_out[key].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(our_o), r, rtol=RTOL, atol=ATOL)


def test_retinanet_logit_parity_with_reference():
    import torch

    from yoloseries_tpu.models import create_model
    from yoloseries_tpu.utils.torch_import import convert_retinanet_state_dict

    torch.manual_seed(5)
    nc = 4
    ref = load_reference_model("retinanet")(
        num_anchor=9, num_class=nc, resnet_layers=[3, 4, 6, 3]
    ).eval()
    params, stats = convert_retinanet_state_dict(ref.state_dict(), nc)
    model = create_model("retinanet", num_class=nc)
    _check_tree_matches(model, params, 128)

    ref_out, ours = _run_pair(ref, model, params, stats, 128)
    ref_reg, ref_cls = (t.numpy() for t in ref_out)  # (b, sumHW*9, 4/nc)
    np.testing.assert_allclose(np.asarray(ours[0]), ref_reg, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(ours[1]), ref_cls, rtol=RTOL, atol=ATOL)


def test_fcos_logit_parity_with_reference():
    import torch

    from yoloseries_tpu.models import create_model
    from yoloseries_tpu.utils.torch_import import convert_fcos_state_dict

    torch.manual_seed(6)
    nc = 4
    ref = load_reference_model("fcos")(
        num_class=nc, resnet_layers=[3, 4, 6, 3],
        norm_layer_type="group_norm", enable_head_scale=True,
    ).eval()
    params, stats = convert_fcos_state_dict(ref.state_dict(), nc)
    assert stats == {}  # GroupNorm only: no running statistics
    model = create_model("fcos", num_class=nc)
    _check_tree_matches(model, params, 128)

    ref_out, ours = _run_pair(ref, model, params, stats, 128)
    ref_cls, ref_reg, ref_ctr = ref_out  # 5-level NCHW lists
    our_cls, our_reg, our_ctr = ours
    for lists in ((ref_cls, our_cls), (ref_reg, our_reg), (ref_ctr, our_ctr)):
        for r, o in zip(*lists):
            np.testing.assert_allclose(
                np.asarray(o), r.numpy().transpose(0, 2, 3, 1),
                rtol=RTOL, atol=ATOL,
            )
