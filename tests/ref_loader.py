"""Shared harness for executing reference (/root/reference) torch modules
in isolation: stubs unavailable deps (numba/loguru/thop) and loads a model
file with a minimal fake `utils` namespace built from utils/layer_tools.py,
skipping the reference's heavy utils/__init__ import chain (cv2, dist, ...).

The reference code is only *executed* for parity oracles — never copied.
"""

import importlib.util
import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")


def install_stubs():
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.njit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
        sys.modules["numba"] = numba
    if "loguru" not in sys.modules:
        loguru = types.ModuleType("loguru")

        class _Logger:
            def catch(self, *a, **k):
                return a[0] if a and callable(a[0]) else (lambda f: f)

            def __getattr__(self, _):
                return lambda *a, **k: None

        loguru.logger = _Logger()
        sys.modules["loguru"] = loguru
    if "thop" not in sys.modules:
        thop = types.ModuleType("thop")
        thop.profile = lambda *a, **k: (0, 0)
        sys.modules["thop"] = thop


_layer_tools = None


def layer_tools():
    """Load reference utils/layer_tools.py standalone (torch-only), once."""
    global _layer_tools
    if _layer_tools is None:
        install_stubs()
        spec = importlib.util.spec_from_file_location(
            "_ref_layer_tools_shared", REFERENCE / "utils" / "layer_tools.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _layer_tools = mod
    return _layer_tools


def load_reference_module(rel_path: str, utils_names: tuple, mod_name: str):
    """Execute a reference model file with `utils` faked to expose only
    ``utils_names`` from layer_tools. Returns the loaded module."""
    install_stubs()
    lt = layer_tools()
    fake_utils = types.ModuleType("utils")
    for name in utils_names:
        setattr(fake_utils, name, getattr(lt, name))
    saved = sys.modules.get("utils")
    sys.modules["utils"] = fake_utils
    try:
        spec = importlib.util.spec_from_file_location(mod_name, REFERENCE / rel_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if saved is not None:
            sys.modules["utils"] = saved
        else:
            sys.modules.pop("utils", None)
    return mod


# model zoo: name -> (file, utils names, class attr, ctor kwargs)
REF_MODELS = {
    "yolov5s": (
        "models/normal/yolov5s.py",
        ("ConvBnAct", "Upsample", "Concat", "Detect", "C3BottleneckCSP", "FastSPP"),
        "YOLOV5Small",
    ),
    "yolov5m": (
        "models/normal/yolov5m.py",
        ("ConvBnAct", "Upsample", "Concat", "Detect", "C3BottleneckCSP", "FastSPP"),
        "YOLOV5Middle",
    ),
    "yolox_s": (
        "models/normal/yolox_s.py",
        ("ConvBnAct", "Upsample", "Concat", "Detect", "C3BottleneckCSP", "FastSPP"),
        "YOLOXSmall",
    ),
    "yolov7": (
        "models/normal/yolov7.py",
        ("ConvBnAct", "CSPCSPP", "Upsample", "Concat", "ImplicitMul",
         "ImplicitAdd", "RepConv", "fuse_conv_bn"),
        "YOLOV7Baseline",
    ),
    "yolov8": (
        "models/normal/yolov8.py",
        ("ConvBnAct", "Upsample", "Concat", "FastSPP", "C2f",
         "DistributionFocalLoss"),
        "YOLOV8",
    ),
    "retinanet": (
        "models/normal/retinanet.py",
        ("resnet50", "RetinaNetClassification", "RetinaNetRegression",
         "RetinaNetPyramidFeatures"),
        "RetinaNet",
    ),
    "fcos": (
        "models/normal/fcos.py",
        ("resnet50", "Scale"),
        "FCOSBaseline",
    ),
}


def load_reference_model(key: str):
    rel, names, cls = REF_MODELS[key]
    mod = load_reference_module(rel, names, f"_ref_{key}")
    return getattr(mod, cls)


# loss modules: family -> (file, class attr)
REF_LOSSES = {
    "yolov5": ("loss/yolov5_loss.py", "YOLOV5Loss"),
    "yolov7": ("loss/yolov7_loss.py", "YOLOV7Loss"),
    "yolox": ("loss/yolox_loss.py", "YOLOXLoss"),
    "yolov8": ("loss/yolov8_loss.py", "YOLOV8Loss"),
    "retinanet": ("loss/retinanet_loss.py", "RetinaNetLoss"),
    "fcos": ("loss/fcos_loss.py", "FCOSLoss"),
}


def load_reference_loss(family: str):
    """Execute a reference loss module (loss/*_loss.py) with a fake `utils`
    namespace carrying the REAL bbox math from utils/bbox_tools.py, the real
    GPUAnchor from utils/anchor.py (retinanet), and identity dist stubs
    (reduce_mean/gather/get_local_rank — single-process semantics, the
    reference's own world_size==1 fast path). Returns the loss class."""
    install_stubs()
    # anchor.py imports sklearn/matplotlib at module scope; stub if absent
    for name in ("sklearn", "sklearn.cluster", "matplotlib", "matplotlib.pyplot"):
        if name not in sys.modules:
            try:
                importlib.import_module(name)
            except ImportError:
                mod = types.ModuleType(name)
                if name == "sklearn.cluster":
                    mod.KMeans = object
                sys.modules[name] = mod

    def _load(rel, mod_name):
        spec = importlib.util.spec_from_file_location(mod_name, REFERENCE / rel)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    bbox_tools = _load("utils/bbox_tools.py", "_ref_bbox_tools_loss")
    fake_utils = types.ModuleType("utils")
    for name in (
        "xyxy2xywhn", "xyxy2xywh", "xywh2xyxy", "tblr2xyxy", "xyxy2tblr",
        "gpu_iou", "gpu_CIoU", "gpu_DIoU", "gpu_Giou",
    ):
        setattr(fake_utils, name, getattr(bbox_tools, name))
    if family == "retinanet":
        anchor = _load("utils/anchor.py", "_ref_anchor_loss")
        fake_utils.GPUAnchor = anchor.GPUAnchor
    # dist helpers (fcos): single-process identity semantics
    fake_utils.reduce_mean = lambda t: t
    fake_utils.gather = lambda data, dst=0: [data]
    fake_utils.get_local_rank = lambda: 0

    saved = sys.modules.get("utils")
    sys.modules["utils"] = fake_utils
    try:
        rel, cls_name = REF_LOSSES[family]
        mod = _load(rel, f"_ref_loss_{family}")
    finally:
        if saved is not None:
            sys.modules["utils"] = saved
        else:
            sys.modules.pop("utils", None)
    return getattr(mod, cls_name)


# evaluators: family -> (file, class attr)
REF_EVALUATORS = {
    "yolov5": ("eval_yolov5.py", "YOLOV5Evaluator"),
    "yolov7": ("eval_yolov7.py", "YOLOV7Evaluator"),
    "yolox": ("eval_yolox.py", "YOLOXEvaluator"),
    "yolov8": ("eval_yolov8.py", "YOLOV8Evaluator"),
    "retinanet": ("eval_retinanet.py", "RetinaNetEvaluator"),
    "fcos": ("eval_fcos.py", "FCOSEvaluator"),
}


def load_reference_evaluator(family: str):
    """Execute trainer/eval_*.py with a fake `utils` namespace carrying the
    real nms/bbox_tools/anchor functions (numba stubbed to pure python).
    Returns the evaluator class."""
    install_stubs()

    pkg = types.ModuleType("_refu")
    pkg.__path__ = [str(REFERENCE / "utils")]
    sys.modules["_refu"] = pkg

    def _load(name):
        spec = importlib.util.spec_from_file_location(
            f"_refu.{name}", REFERENCE / "utils" / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"_refu.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    bbox_tools = _load("bbox_tools")
    nms = _load("nms")

    fake_utils = types.ModuleType("utils")
    fake_utils.gpu_nms = nms.gpu_nms
    fake_utils.numba_nms = nms.numba_nms
    fake_utils.numba_iou = bbox_tools.numba_iou
    fake_utils.numba_xywh2xyxy = bbox_tools.numba_xywh2xyxy
    fake_utils.numba_xyxy2xywh = bbox_tools.numba_xyxy2xywh
    fake_utils.xywh2xyxy = bbox_tools.xywh2xyxy
    fake_utils.tblr2xyxy = bbox_tools.tblr2xyxy
    fake_utils.weighted_fusion_bbox = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("wfb not wired in this harness")
    )
    if family == "retinanet":
        for name in ("sklearn", "sklearn.cluster", "matplotlib",
                     "matplotlib.pyplot"):
            if name not in sys.modules:
                try:
                    importlib.import_module(name)
                except ImportError:
                    mod = types.ModuleType(name)
                    if name == "sklearn.cluster":
                        mod.KMeans = object
                    sys.modules[name] = mod
        anchor = _load("anchor")
        fake_utils.GPUAnchor = anchor.GPUAnchor
    saved = sys.modules.get("utils")
    sys.modules["utils"] = fake_utils
    try:
        rel, cls_name = REF_EVALUATORS[family]
        spec = importlib.util.spec_from_file_location(
            f"_ref_{rel[:-3]}", REFERENCE / "trainer" / rel
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if saved is not None:
            sys.modules["utils"] = saved
        else:
            sys.modules.pop("utils", None)
    return getattr(mod, cls_name)


def load_reference_v5_evaluator():
    return load_reference_evaluator("yolov5")


_trainer_mods = {}


def load_reference_training(family: str = "yolov5"):
    """Import the reference's full train_<family>.py module (with stubs for
    emoji/torchinfo/loguru/numba/thop and /root/reference on sys.path so its
    config/loss/utils/dataset/models/trainer packages resolve for real).

    The returned module's ``Training`` class is driven UNBOUND on surrogate
    instances (``Training._init_optimizer(surrogate)`` etc.) — never
    instantiated, since its ``__init__`` builds dataloaders/loggers. This
    executes the reference's exact optimizer-group construction
    (train_yolov5.py:257-281), scheduler lambdas (:152-165), and warmup
    interpolation (:437-456) for trajectory-parity oracles.
    """
    if family not in _trainer_mods:
        install_stubs()
        for name in ("emoji", "emoji.core"):
            if name not in sys.modules:
                mod = types.ModuleType(name)
                mod.emojize = lambda s, *a, **k: s
                mod.core = mod
                sys.modules[name] = mod
        if "torchinfo" not in sys.modules:
            ti = types.ModuleType("torchinfo")
            ti.summary = lambda *a, **k: None
            sys.modules["torchinfo"] = ti
        if "torchvision" not in sys.modules:
            # only transforms.Compose/ToTensor/Normalize are touched at
            # import time (dataset/data_collater.py:11-12); the oracle never
            # runs the collate path
            tv = types.ModuleType("torchvision")
            tvt = types.ModuleType("torchvision.transforms")
            for n in ("Compose", "ToTensor", "Normalize", "Resize"):
                setattr(tvt, n, lambda *a, **k: (lambda x: x))
            tv.transforms = tvt
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = tvt
        saved_utils = sys.modules.pop("utils", None)
        sys.path.insert(0, str(REFERENCE))
        try:
            spec = importlib.util.spec_from_file_location(
                f"_ref_train_{family}", REFERENCE / f"train_{family}.py"
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
        finally:
            sys.path.remove(str(REFERENCE))
            if saved_utils is not None:
                sys.modules["utils"] = saved_utils
        _trainer_mods[family] = mod
    return _trainer_mods[family]
