"""Preset coverage: all 10 reference YAMLs have a drop-in preset, and each
train preset drives one successful jitted train step for its family
(VERDICT round-1 item 2). Reference set: /root/reference/config/*.yaml."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloseries_tpu.configs import TrainConfig, load_hyp
from yoloseries_tpu.families import get_family
from yoloseries_tpu.models import create_model
from yoloseries_tpu.train import build_optimizer, create_train_state, make_train_step

PRESETS = Path(__file__).resolve().parents[1] / "yoloseries_tpu/configs/presets"

ALL_PRESETS = [
    "train_yolov5.yaml",
    "train_yolov7.yaml",
    "train_yolov8.yaml",
    "train_yolox.yaml",
    "train_fcos.yaml",
    "train_retinanet.yaml",
    "finetune_yolov5.yaml",
    "finetune_yolox.yaml",
    "validation.yaml",
    "detection_yolov5.yaml",
]

# (preset, model) pairs: one jitted train step per family
TRAIN_CASES = [
    ("train_yolov5.yaml", "yolov5s"),
    ("train_yolov7.yaml", "yolov7"),
    ("train_yolov8.yaml", "yolov8"),
    ("train_yolox.yaml", "yolox_s"),
    ("train_fcos.yaml", "fcos"),
    ("train_retinanet.yaml", "retinanet"),
]


def test_all_reference_presets_exist():
    for name in ALL_PRESETS:
        assert (PRESETS / name).exists(), f"missing preset {name}"


@pytest.mark.parametrize("preset", ALL_PRESETS)
def test_preset_loads_flat(preset):
    hyp = load_hyp(PRESETS / preset)
    assert isinstance(hyp, dict) and hyp
    # flattening must not leave section dicts behind
    assert not any(isinstance(v, dict) for v in hyp.values())


def test_family_keys_survive_flattening():
    assert load_hyp(PRESETS / "train_yolox.yaml")["topk"] == 13
    assert load_hyp(PRESETS / "train_yolox.yaml")["center_radius"] == 3
    v8 = load_hyp(PRESETS / "train_yolov8.yaml")
    assert (v8["alpha"], v8["beta"], v8["reg"]) == (0.5, 6.0, 16)
    rn = load_hyp(PRESETS / "train_retinanet.yaml")
    assert (rn["positive_iou_thr"], rn["negative_iou_thr"]) == (0.5, 0.4)
    assert load_hyp(PRESETS / "train_fcos.yaml")["center_sampling_radius"] == 1.5
    assert load_hyp(PRESETS / "train_yolov7.yaml")["topk"] == 15
    val = load_hyp(PRESETS / "validation.yaml")
    assert (val["conf_threshold"], val["iou_threshold"]) == (0.001, 0.65)


@pytest.mark.slow
@pytest.mark.parametrize("preset,model_name", TRAIN_CASES)
def test_preset_one_train_step(preset, model_name):
    """load_hyp -> TrainConfig.from_hyp -> one jitted train step, per family."""
    size, nc, batch = (64, 64), 3, 2
    hyp = load_hyp(PRESETS / preset)
    cfg = TrainConfig.from_hyp(
        hyp, num_class=nc, input_size=size, batch_size=batch, total_epochs=2,
    )
    assert cfg.input_size == size

    model = create_model(model_name, num_class=nc)
    fam = get_family(model_name)
    loss_fn, balances0 = fam.make_loss(cfg.hyp, nc, size)

    opt_cfg = type(cfg.optim)(
        **{**cfg.optim.__dict__, "steps_per_epoch": 2, "do_warmup": False}
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *size, 3)), train=False
    )["params"]
    tx = build_optimizer(opt_cfg, params)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), (1, *size, 3), balances=balances0
    )
    step_fn = make_train_step(loss_fn, accumulate=1, donate=False)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (batch, *size, 3), dtype=np.uint8)
    ann = np.full((batch, 8, 6), -1, dtype=np.float32)
    for i in range(batch):
        ann[i, 0] = [8, 8, 40, 40, i % nc, i]
    new_state, metrics = step_fn(
        state, {"img": jnp.asarray(img), "ann": jnp.asarray(ann)}
    )
    assert np.isfinite(float(metrics["tot_loss"]))
    assert int(new_state.step) == 1
