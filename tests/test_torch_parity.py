"""Logit parity: reference torch YOLOv5s vs this framework's flax graph.

The strongest architecture-parity check available without the reference's
(Baidu-hosted) checkpoints: instantiate the reference model with random
weights, convert its state_dict through `convert_yolov5_state_dict`, run
both on the same input, and demand matching raw maps.

Requires the reference repo at /root/reference (skipped elsewhere) and stubs
its unavailable imports (numba, loguru) — the reference code is only
*executed*, never copied.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = [
    pytest.mark.skipif(not REFERENCE.exists(), reason="reference repo not mounted"),
    pytest.mark.slow,
]


def _install_stubs():
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.njit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
        sys.modules["numba"] = numba
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")

        class _Logger:
            def __getattr__(self, _):
                return lambda *a, **k: (lambda f: f) if _ == "catch" else None

            def catch(self, *a, **k):
                return a[0] if a and callable(a[0]) else (lambda f: f)

            def info(self, *a, **k):
                pass

            def warning(self, *a, **k):
                pass

        loguru.logger = _Logger()
        sys.modules["loguru"] = loguru
    if "thop" not in sys.modules:
        thop = types.ModuleType("thop")
        thop.profile = lambda *a, **k: (0, 0)
        sys.modules["thop"] = thop


def _load_reference_yolov5s():
    _install_stubs()
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    import importlib.util

    # load utils.layer_tools standalone (torch/numpy only), then feed the
    # model module a minimal 'utils' namespace so we skip the heavy
    # utils/__init__ import chain (cv2 windows, dist, etc.)
    spec = importlib.util.spec_from_file_location(
        "_ref_layer_tools", REFERENCE / "utils" / "layer_tools.py"
    )
    lt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lt)

    fake_utils = types.ModuleType("utils")
    for name in ("ConvBnAct", "Upsample", "Concat", "Detect",
                 "C3BottleneckCSP", "FastSPP"):
        setattr(fake_utils, name, getattr(lt, name))
    saved = sys.modules.get("utils")
    sys.modules["utils"] = fake_utils
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_yolov5s", REFERENCE / "models" / "normal" / "yolov5s.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if saved is not None:
            sys.modules["utils"] = saved
        else:
            sys.modules.pop("utils", None)
    return mod.YOLOV5Small


def test_yolov5s_logit_parity_with_reference():
    import torch

    import jax
    import jax.numpy as jnp

    from yoloseries_tpu.models import create_model
    from yoloseries_tpu.utils.torch_import import convert_yolov5_state_dict

    YOLOV5Small = _load_reference_yolov5s()
    torch.manual_seed(0)
    nc = 7
    ref = YOLOV5Small(3, nc).eval()

    params, stats = convert_yolov5_state_dict(ref.state_dict(), nc)

    model = create_model("yolov5s", num_class=nc)
    # sanity: converted tree matches the flax-initialized structure
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(init["params"])[0]}
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths, (
        f"missing: {sorted(ref_paths - got_paths)[:5]} "
        f"extra: {sorted(got_paths - ref_paths)[:5]}"
    )

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x))

    ours = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )

    for ref_o, our_o in zip(ref_outs, ours):
        ref_nhwc = ref_o.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(our_o), ref_nhwc, rtol=5e-3, atol=5e-4
        )


def test_map_parity_with_reference_mAP_v2(tmp_path):
    """Our DetectionMetrics must reproduce the reference's mAP_v2 EXACTLY
    (same matching, same interpolation) on random detections."""
    import importlib.util

    _install_stubs()
    pkg = types.ModuleType("refutils")
    pkg.__path__ = [str(REFERENCE / "utils")]
    sys.modules["refutils"] = pkg

    def load(name):
        spec = importlib.util.spec_from_file_location(
            f"refutils.{name}", REFERENCE / "utils" / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refutils.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    load("common")
    mAP_mod = load("mAP")

    from yoloseries_tpu.ops import DetectionMetrics

    rng = np.random.default_rng(42)
    gts, preds = [], []
    for _ in range(25):
        n = rng.integers(1, 6)
        xy = rng.uniform(0, 400, (n, 2))
        wh = rng.uniform(20, 120, (n, 2))
        gt = np.concatenate([xy, xy + wh, rng.integers(0, 5, (n, 1))], axis=1)
        m = rng.integers(1, 10)
        rows = []
        for i in range(m):
            if i < n and rng.random() < 0.7:
                j = gt[i % n]
                jit = rng.normal(0, 8, 4)
                rows.append([j[0] + jit[0], j[1] + jit[1], j[2] + jit[2],
                             j[3] + jit[3], rng.uniform(0.3, 1), j[4]])
            else:
                xy2 = rng.uniform(0, 400, 2)
                wh2 = rng.uniform(20, 100, 2)
                rows.append([xy2[0], xy2[1], xy2[0] + wh2[0], xy2[1] + wh2[1],
                             rng.uniform(0.05, 0.9), rng.integers(0, 5)])
        pred = np.abs(np.array(rows))
        pred[:, 2] = np.maximum(pred[:, 2], pred[:, 0] + 1)
        pred[:, 3] = np.maximum(pred[:, 3], pred[:, 1] + 1)
        gts.append(gt)
        preds.append(pred)

    ref = mAP_mod.mAP_v2(gts, preds, str(tmp_path))
    r_map, r_map50, r_mp, r_mr = ref.get_mean_metrics()

    ours = DetectionMetrics()
    for g, p in zip(gts, preds):
        ours.add_image(g, p)
    o = ours.compute()
    assert abs(r_map - o["map"]) < 1e-9
    assert abs(r_map50 - o["map50"]) < 1e-9
    assert abs(r_mp - o["mp"]) < 1e-9
    assert abs(r_mr - o["mr"]) < 1e-9


def test_nms_parity_with_reference_numba_nms():
    """Our greedy NMS keep-list must match the reference's numba_nms
    (executed as pure python via the numba stub) index for index."""
    import importlib.util

    import jax.numpy as jnp

    _install_stubs()
    pkg = types.ModuleType("refutils2")
    pkg.__path__ = [str(REFERENCE / "utils")]
    sys.modules["refutils2"] = pkg

    def load(name):
        spec = importlib.util.spec_from_file_location(
            f"refutils2.{name}", REFERENCE / "utils" / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refutils2.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    load("bbox_tools")
    nms_mod = load("nms")

    from yoloseries_tpu.ops import greedy_nms

    rng = np.random.default_rng(3)
    for _ in range(4):
        n = 80
        xy = rng.uniform(0, 300, (n, 2))
        wh = rng.uniform(10, 90, (n, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        ref_keep = nms_mod.numba_nms(boxes.copy(), scores.copy(), 0.5)
        ki, kv = greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, n)
        ours = np.asarray(ki)[np.asarray(kv)].tolist()
        assert ours == list(ref_keep), (ours[:10], list(ref_keep)[:10])


def test_yolov5m_logit_parity_with_reference():
    """Same check for the m size — validates the depth/channel tables
    (reference models/normal/yolov5m.py) through the shared name mapping."""
    import importlib.util

    import torch

    import jax.numpy as jnp

    from yoloseries_tpu.models import create_model
    from yoloseries_tpu.utils.torch_import import convert_yolov5_state_dict

    _install_stubs()
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    spec = importlib.util.spec_from_file_location(
        "_ref_layer_tools_m", REFERENCE / "utils" / "layer_tools.py"
    )
    lt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lt)
    fake_utils = types.ModuleType("utils")
    for name in ("ConvBnAct", "Upsample", "Concat", "Detect",
                 "C3BottleneckCSP", "FastSPP"):
        setattr(fake_utils, name, getattr(lt, name))
    saved = sys.modules.get("utils")
    sys.modules["utils"] = fake_utils
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_yolov5m", REFERENCE / "models" / "normal" / "yolov5m.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if saved is not None:
            sys.modules["utils"] = saved
        else:
            sys.modules.pop("utils", None)

    torch.manual_seed(1)
    nc = 4
    ref = mod.YOLOV5Middle(3, nc).eval()
    params, stats = convert_yolov5_state_dict(ref.state_dict(), nc)
    model = create_model("yolov5m", num_class=nc)

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x))
    ours = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    for ref_o, our_o in zip(ref_outs, ours):
        np.testing.assert_allclose(
            np.asarray(our_o), ref_o.numpy().transpose(0, 2, 3, 1),
            rtol=5e-3, atol=5e-4,
        )
