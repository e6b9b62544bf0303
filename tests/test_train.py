import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from yoloseries_tpu.losses import YOLOv5LossConfig
from yoloseries_tpu.ops import YOLOV5_ANCHORS
from yoloseries_tpu.train import (
    OptimizerConfig,
    TrainState,
    build_optimizer,
    create_train_state,
    ema_decay_weight,
    make_train_step,
)
from yoloseries_tpu.train.optim import lr_schedule_factor


class ToyDetector(nn.Module):
    """Minimal 3-scale detector for trainer-machinery tests (fast compile)."""

    num_class: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), strides=(2, 2), name="c1")(x)  # /2
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(8, (3, 3), strides=(4, 4), name="c2")(x)  # /8
        outs = []
        y = x
        for i in range(3):
            outs.append(
                nn.Conv(3 * (5 + self.num_class), (1, 1), name=f"head{i}")(y)
            )
            if i < 2:
                y = nn.avg_pool(y, (2, 2), strides=(2, 2))
        return outs


def make_batch(size=64, batch=2, max_labels=8):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    ann = np.full((batch, max_labels, 6), -1, dtype=np.float32)
    ann[0, 0] = [8, 8, 40, 40, 1, 0]
    ann[1, 0] = [16, 20, 60, 62, 2, 1]
    return {"img": jnp.asarray(img), "ann": jnp.asarray(ann)}


def build_state(accumulate=1, size=64):
    model = ToyDetector()
    cfg = OptimizerConfig(
        batch_size=2, total_epochs=10, steps_per_epoch=5, warmup_epochs=1,
        basic_lr_per_img=0.005,
    )
    params_shape = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False)
    )
    # build real params to init optimizer
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False)
    tx = build_optimizer(cfg, variables["params"])
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (1, size, size, 3))
    loss_cfg = YOLOv5LossConfig(num_class=3, input_size=(size, size), use_focal_loss=False)
    step_fn = make_train_step(loss_cfg, YOLOV5_ANCHORS, accumulate=accumulate, donate=False)
    return state, step_fn


@pytest.mark.slow
def test_train_step_reduces_loss():
    state, step_fn = build_state()
    batch = make_batch()
    losses = []
    for _ in range(25):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["tot_loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 25
    assert float(state.ema_count) == 25.0


@pytest.mark.slow
def test_train_step_accumulation():
    state, step_fn = build_state(accumulate=2)
    batch = make_batch(batch=4)  # 2 microbatches of 2
    state, metrics = step_fn(state, batch)
    assert int(state.step) == 1  # one optimizer update for 2 microbatches
    assert np.isfinite(float(metrics["tot_loss"]))


def test_multiscale_resize_matches_torch_interpolate():
    """The device multi-scale resize (state.make_train_step resize_to) must
    reproduce the reference's F.interpolate(bilinear, align_corners=False)
    on the normalized batch (train_yolov5.py:536-543) — up AND down scale.
    Bilinearity lets the step resize the raw-cast image and normalize after."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    for new in (96, 32):
        ours = np.asarray(jax.image.resize(
            jnp.asarray(img).astype(jnp.float32),
            (2, new, new, 3), method="bilinear", antialias=False,
        ) / 255.0)
        t = torch.from_numpy(
            img.transpose(0, 3, 1, 2).astype(np.float32) / 255.0
        )
        ref = F.interpolate(t, size=(new, new), mode="bilinear",
                            align_corners=False)
        np.testing.assert_allclose(
            ours, ref.numpy().transpose(0, 2, 3, 1), atol=2e-6,
        )


@pytest.mark.slow
def test_train_step_multiscale_interpolate():
    """A resize_to step consumes BASE-size batches, trains at the bucket
    size, and scales targets by new/base (reference semantics)."""
    size, new = 64, 96
    model = ToyDetector()
    cfg = OptimizerConfig(
        batch_size=2, total_epochs=10, steps_per_epoch=5, warmup_epochs=1,
        basic_lr_per_img=0.005,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False
    )
    tx = build_optimizer(cfg, variables["params"])
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (1, size, size, 3))
    loss_cfg = YOLOv5LossConfig(num_class=3, input_size=(new, new),
                                use_focal_loss=False)
    step_fn = make_train_step(loss_cfg, YOLOV5_ANCHORS, donate=False,
                              resize_to=(new, new), base_hw=(size, size))
    state, metrics = step_fn(state, make_batch(size=size))
    assert np.isfinite(float(metrics["tot_loss"]))
    assert int(state.step) == 1


@pytest.mark.slow
def test_ema_follows_params():
    state, step_fn = build_state()
    batch = make_batch()
    p0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    for _ in range(3):
        state, _ = step_fn(state, batch)
    p = np.asarray(jax.tree.leaves(state.params)[0])
    e = np.asarray(jax.tree.leaves(state.ema_params)[0])
    # early EMA decay is tiny -> EMA tracks params closely, but both moved
    assert not np.allclose(p0, p)
    assert np.abs(e - p).max() < np.abs(p0 - p).max()


def test_ema_decay_curve():
    np.testing.assert_allclose(float(ema_decay_weight(0)), 0.0, atol=1e-9)
    d2000 = float(ema_decay_weight(2000))
    assert abs(d2000 - 0.9999 * (1 - np.exp(-1))) < 1e-6
    assert float(ema_decay_weight(1e9)) <= 0.9999 + 1e-9


def test_lr_schedules():
    cfg = OptimizerConfig(total_epochs=100, steps_per_epoch=10, lr_max_ds_scale=0.01)
    # linear: epoch 0 -> 1.0, last epoch -> lr_max_ds_scale
    assert abs(float(lr_schedule_factor(cfg, 0)) - 1.0) < 1e-6
    assert abs(float(lr_schedule_factor(cfg, 99)) - 0.01) < 1e-6
    cfg_cos = OptimizerConfig(
        total_epochs=100, steps_per_epoch=10, scheduler_type="cosine",
        lr_max_ds_scale=0.01,
    )
    assert abs(float(lr_schedule_factor(cfg_cos, 0)) - 1.0) < 1e-6
    assert abs(float(lr_schedule_factor(cfg_cos, 100)) - 0.01) < 1e-5


def test_param_group_labels():
    from yoloseries_tpu.train.optim import param_group_label

    assert param_group_label(("detect", "bias"), None) == "bias"
    assert param_group_label(("bn", "scale"), None) == "other"
    assert param_group_label(("conv", "kernel"), None) == "weight"

    # through tree_map_with_path, as build_optimizer actually calls it —
    # path entries are DictKey objects whose str() is "['bias']", which a
    # naive str(path[-1]) mislabels into the 'weight' catch-all
    tree = {"detect": {"bias": 0.0}, "bn": {"scale": 0.0},
            "conv": {"kernel": 0.0}}
    labels = jax.tree_util.tree_map_with_path(param_group_label, tree)
    assert labels == {"detect": {"bias": "bias"}, "bn": {"scale": "other"},
                      "conv": {"kernel": "weight"}}


@pytest.mark.slow
def test_balances_carried_in_state():
    state, step_fn = build_state()
    b0 = np.asarray(state.balances).copy()
    state, _ = step_fn(state, make_batch())
    assert not np.allclose(b0, np.asarray(state.balances))
    assert abs(float(state.balances[1]) - 1.0) < 1e-6
