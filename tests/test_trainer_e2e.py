import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

from yoloseries_tpu.configs import TrainConfig, load_hyp
from yoloseries_tpu.data.augment import AugmentConfig


@pytest.fixture(scope="module")
def micro_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    img_dir, lab_dir = root / "img", root / "lab"
    img_dir.mkdir()
    lab_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(8):
        img = np.full((96, 96, 3), 30, dtype=np.uint8)
        x1, y1 = int(rng.integers(5, 40)), int(rng.integers(5, 40))
        x2, y2 = x1 + 30, y1 + 30
        cls = i % 2
        img[y1:y2, x1:x2] = [220, 60 + 100 * cls, 40]
        Image.fromarray(img).save(img_dir / f"{i}.jpg")
        (lab_dir / f"{i}.txt").write_text(f"{cls} {x1} {y1} {x2} {y2}\n")
    names = root / "names.txt"
    names.write_text("0 square\n1 box\n")
    return img_dir, lab_dir, names


def register_toy():
    from flax import linen as nn

    from yoloseries_tpu.models.registry import _REGISTRY, register

    if "toy" in _REGISTRY:
        return

    class Toy(nn.Module):
        num_class: int = 2
        dtype: object = None

        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), strides=(2, 2))(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.97)(x)
            x = nn.relu(x)
            x = nn.Conv(16, (3, 3), strides=(4, 4))(x)  # /8
            outs = []
            y = x
            for i in range(3):
                outs.append(nn.Conv(3 * (5 + self.num_class), (1, 1))(y))
                if i < 2:
                    y = nn.avg_pool(y, (2, 2), strides=(2, 2))
            return outs

    register("toy")(lambda num_class, **kw: Toy(num_class=num_class))


def test_trainer_end_to_end(micro_dirs, tmp_path):
    """Full loop: dataset -> loader -> jitted step -> eval -> checkpoint."""
    import jax

    register_toy()
    img_dir, lab_dir, names = micro_dirs
    hyp = {
        "input_img_size": [64, 64],
        "batch_size": 4,
        "total_epoch": 3,
        "use_focal_loss": False,
        "family": "yolov5",
        "basic_lr_per_img": 0.01,
        "warmup_epoch": 0,
        "do_warmup": False,
        "data_aug_mosaic_p": 0.0,
        "data_aug_mixup_p": 0.0,
        "data_aug_prespective_p": 0.0,
        "data_aug_hsv_p": 0.0,
        "data_aug_cutout_p": 0.0,
        "data_aug_fliplr_p": 0.0,
    }
    cfg = TrainConfig.from_hyp(
        hyp, num_class=2, model="toy", max_labels=16,
        output_dir=str(tmp_path / "run"), no_aug_epochs=0,
    )
    from yoloseries_tpu.train import Trainer

    tr = Trainer(cfg, (img_dir, lab_dir), val_dirs=(img_dir, lab_dir),
                 names_path=names, log_fn=lambda *a: None)
    try:
        first_losses, last_losses = [], []
        tr.train(epochs=2)
        loss_after = tr.meters["tot_loss"].avg
        assert np.isfinite(loss_after)
        assert int(tr.state.step) == 2 * tr.steps_per_epoch
        # eval runs end-to-end and produces a metric dict
        out = tr.evaluate(max_batches=1)
        assert set(out) >= {"map", "map50", "mp", "mr"}
        # checkpoint round trip
        tr.save(int(tr.state.step))
        step_before = int(tr.state.step)
        tr.load()
        assert int(tr.state.step) == step_before
    finally:
        tr.close()


def test_config_from_reference_yaml(tmp_path):
    """A reference-format YAML flattens and lifts into typed configs."""
    yaml_text = """
loss_hyp:
  use_focal_loss: true
  iou_loss_scale: 0.05
  anchor_match_thr: 4.0
train_hyp:
  input_img_size: [640, 640]
  batch_size: 16
  total_epoch: 100
  accumulate_loss_step: 32
optimizer_hyp:
  optimizer: 'sgd'
  basic_lr_per_img: 0.000625
  scheduler_type: 'linear'
warm_up:
  do_warmup: true
  warmup_epoch: 3
data_hyp:
  data_aug_mosaic_p: 0.7
nms_hyp:
  iou_threshold: 0.2
  max_predictions_per_img: 300
val_hyp:
  compute_metric_conf_threshold: 0.001
"""
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml_text)
    hyp = load_hyp(p)
    assert hyp["use_focal_loss"] is True
    assert hyp["batch_size"] == 16
    cfg = TrainConfig.from_hyp(hyp, num_class=80)
    assert cfg.batch_size == 16
    assert cfg.accumulate == 2  # 32 / 16
    assert cfg.aug.mosaic_p == 0.7
    assert cfg.loss.num_class == 80
    assert cfg.optim.lr == pytest.approx(0.000625 * 16)
    assert cfg.eval.max_keep == 300
