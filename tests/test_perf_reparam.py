"""Equivalence tests for the training-perf reparameterizations.

Two MFU levers from the round-2 review (VERDICT "Next #2"), both
equivalence-preserving by construction and certified here:

* space-to-depth stem: the reference's 6x6/2 stem conv
  (/root/reference/models/normal/yolov5s.py:16) re-expressed as
  space_to_depth + 3x3/1 conv (models/yolov5.py:space_to_depth2,
  nn/deploy.py:fold_stem_to_s2d) — identical arithmetic, 4x less
  channel-padding waste on the largest feature map,
* per-CSP-stage remat (jax.checkpoint): identical params and grads,
  trades recompute FLOPs for activation HBM.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloseries_tpu.models import YOLOv5, YOLOv5Spec
from yoloseries_tpu.nn.deploy import (
    fold_stem_from_s2d,
    fold_stem_to_s2d,
    stem_kernel_from_s2d,
    stem_kernel_to_s2d,
)

TINY = YOLOv5Spec(8, (1, 1, 1, 1), 1)


def _init(model, rng, size=64):
    return model.init(rng, jnp.zeros((1, size, size, 3)), train=False)


def _abstract_init(model, size=64):
    """Param tree (names/shapes/dtypes) without compiling or running."""
    return jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, size, size, 3)), train=False),
        jax.random.PRNGKey(0),
    )


@pytest.fixture(scope="module")
def tiny_v5():
    """One real init of the TINY base model, shared by the s2d and remat
    equivalence tests (init compiles the whole graph — the single most
    expensive step in this module on a cold cache)."""
    base = YOLOv5(num_class=4, spec=TINY)
    return base, _init(base, jax.random.PRNGKey(0))


def test_s2d_kernel_roundtrip(rng):
    k6 = jnp.asarray(rng.normal(size=(6, 6, 3, 16)).astype(np.float32))
    k3 = stem_kernel_to_s2d(k6)
    assert k3.shape == (3, 3, 12, 16)
    np.testing.assert_array_equal(np.asarray(stem_kernel_from_s2d(k3)), np.asarray(k6))


def test_s2d_kernel_matches_direct_conv(rng):
    """The converted kernel reproduces the 6x6/s2 conv exactly, including
    border padding — checked against lax.conv directly, no model code."""
    from yoloseries_tpu.models.yolov5 import space_to_depth2

    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    k6 = jnp.asarray(rng.normal(size=(6, 6, 3, 8)).astype(np.float32))
    dn = ("NHWC", "HWIO", "NHWC")
    y6 = jax.lax.conv_general_dilated(x, k6, (2, 2), [(2, 2), (2, 2)],
                                      dimension_numbers=dn)
    y3 = jax.lax.conv_general_dilated(
        space_to_depth2(x), stem_kernel_to_s2d(k6), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y6), atol=1e-5)


def test_s2d_model_forward_equivalence(rng, tiny_v5):
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    base, v = tiny_v5
    s2d = YOLOv5(num_class=4, spec=TINY, s2d_stem=True)
    v_s2d = {
        "params": fold_stem_to_s2d(v["params"]),
        "batch_stats": v["batch_stats"],
    }
    # flax must accept the converted tree exactly (same names, new shape)
    ref_tree = jax.tree_util.tree_structure(_abstract_init(s2d))
    assert jax.tree_util.tree_structure(v_s2d) == ref_tree

    out_a = base.apply(v, x, train=False)
    out_b = s2d.apply(v_s2d, x, train=False)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # and back
    v_back = fold_stem_from_s2d(v_s2d["params"])
    np.testing.assert_array_equal(
        np.asarray(v_back["trunk"]["stem"]["conv"]["kernel"]),
        np.asarray(v["params"]["trunk"]["stem"]["conv"]["kernel"]),
    )


def test_remat_grads_identical(rng, tiny_v5):
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    base, v = tiny_v5
    rem = YOLOv5(num_class=4, spec=TINY, remat=True)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        _abstract_init(rem)
    )

    def loss(params, model):
        outs, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return sum(jnp.sum(o * o) for o in outs)

    # On CPU, unjitted per-primitive dispatch beats one whole-graph compile
    # by ~10x on the 1-core CI host; over the TPU relay, op-by-op dispatch
    # is the slow path, so keep the jit there. Numerics are the same.
    if jax.default_backend() == "cpu":
        g_a = jax.grad(loss)(v["params"], base)
        g_b = jax.grad(loss)(v["params"], rem)
    else:
        g_a = jax.jit(jax.grad(loss), static_argnums=1)(v["params"], base)
        g_b = jax.jit(jax.grad(loss), static_argnums=1)(v["params"], rem)
    _assert_grads_equal_mod_rounding(g_a, g_b)


def _assert_grads_equal_mod_rounding(g_a, g_b):
    """jax.checkpoint is mathematically exact, but on TPU the recompute
    compiles into different fusions, so f32 accumulation order differs:
    measured worst elementwise |d| ~9e-3 on grads of magnitude ~2.6e3
    (~eps-level per op, accumulated). A wiring bug (wrong stage, stale
    params) gives relative L2 ~1, so the per-leaf 1e-4 norm bound still
    certifies equivalence."""
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        na = np.linalg.norm(a)
        assert np.linalg.norm(a - b) <= 1e-4 * max(na, 1e-6)
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_trainer_accepts_remat_and_s2d(tmp_path):
    """Both knobs thread from hyp through Trainer to a working train step."""
    import numpy as np
    from PIL import Image

    from yoloseries_tpu.configs import TrainConfig
    from yoloseries_tpu.models.registry import _REGISTRY, register
    from yoloseries_tpu.train import Trainer

    if "yolov5tiny" not in _REGISTRY:
        register("yolov5tiny")(
            lambda num_class, **kw: YOLOv5(num_class=num_class, spec=TINY, **kw)
        )

    img_dir, lab_dir = tmp_path / "img", tmp_path / "lab"
    img_dir.mkdir()
    lab_dir.mkdir()
    for i in range(4):
        img = np.full((64, 64, 3), 40, dtype=np.uint8)
        img[10:40, 10:40] = [200, 80, 60]
        Image.fromarray(img).save(img_dir / f"{i}.jpg")
        (lab_dir / f"{i}.txt").write_text("0 10 10 40 40\n")
    names = tmp_path / "names.txt"
    names.write_text("0 thing\n")

    hyp = {
        "remat": True, "s2d_stem": True,
        "mutil_scale_training": True, "precompile_multi_scale": True,
        "input_img_size": [64, 64], "batch_size": 4, "total_epoch": 1,
        "do_warmup": False, "use_focal_loss": False,
        "data_aug_mosaic_p": 0.0, "data_aug_mixup_p": 0.0,
        "data_aug_prespective_p": 0.0, "data_aug_hsv_p": 0.0,
        "data_aug_cutout_p": 0.0, "data_aug_fliplr_p": 0.0,
        "save_log_txt": False,
    }
    cfg = TrainConfig.from_hyp(
        hyp, num_class=1, model="yolov5tiny", max_labels=8,
        output_dir=str(tmp_path / "run"), no_aug_epochs=0,
    )
    tr = Trainer(cfg, (img_dir, lab_dir), names_path=names,
                 log_fn=lambda *a: None)
    try:
        assert tr.model.remat and tr.model.s2d_stem
        tr.train(epochs=1)
        assert np.isfinite(tr.meters["tot_loss"].avg)
        # precompile_multi_scale compiled every /32 bucket up front
        for s in tr.multi_scale_sizes:
            assert (s, s) in tr._step_fns
    finally:
        tr.close()


@pytest.mark.parametrize(
    "build",
    [
        lambda r: __import__("yoloseries_tpu.models", fromlist=["YOLOv7"]).YOLOv7(
            num_class=4, remat=r),
        lambda r: __import__("yoloseries_tpu.models", fromlist=["YOLOv8"]).YOLOv8(
            num_class=4, scale=0.25, remat=r),
        lambda r: __import__("yoloseries_tpu.models", fromlist=["RetinaNet"]).RetinaNet(
            num_class=4, resnet_layers=(1, 1, 1, 1), remat=r),
        lambda r: __import__("yoloseries_tpu.models", fromlist=["FCOS"]).FCOS(
            num_class=4, resnet_layers=(1, 1, 1, 1), remat=r),
        lambda r: __import__("yoloseries_tpu.models", fromlist=["FCOSCSPNet"]).FCOSCSPNet(
            num_class=4, remat=r),
    ],
    ids=["yolov7", "yolov8", "retinanet", "fcos", "fcos_csp"],
)
def test_family_remat_param_tree_identical(build):
    """remat=True must not change the param pytree for any family (so
    checkpoints are interchangeable and grads are equal up to TPU fusion
    rounding — value-checked for the trunk in test_remat_grads_identical).

    Uses eval_shape: abstract init gives the full pytree (names, shapes,
    dtypes) without compiling/running the model — identical trees + flax's
    path-keyed RNG folding imply identical init values."""
    x = jnp.zeros((1, 64, 64, 3))
    v_a = jax.eval_shape(lambda k: build(False).init(k, x, train=False),
                         jax.random.PRNGKey(0))
    v_b = jax.eval_shape(lambda k: build(True).init(k, x, train=False),
                         jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(v_a) == jax.tree_util.tree_structure(v_b)
    for a, b in zip(jax.tree.leaves(v_a), jax.tree.leaves(v_b)):
        assert a.shape == b.shape and a.dtype == b.dtype


@pytest.mark.slow
def test_family_remat_init_values_identical_yolov8():
    """Advisor r4: the fast tier checks remat param trees by eval_shape
    (shape/dtype only); pin the 'identical trees imply identical VALUES'
    claim empirically for one representative family by running real init."""
    from yoloseries_tpu.models import YOLOv8

    x = jnp.zeros((1, 64, 64, 3))
    v_a = YOLOv8(num_class=4, scale=0.25).init(jax.random.PRNGKey(0), x,
                                               train=False)
    v_b = YOLOv8(num_class=4, scale=0.25, remat=True).init(
        jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v_a) == jax.tree_util.tree_structure(v_b)
    for a, b in zip(jax.tree.leaves(v_a), jax.tree.leaves(v_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_remat_grads_identical_jitted_cpu(rng, tiny_v5):
    """Advisor r4: the fast-tier CPU branch of test_remat_grads_identical
    drops jit for speed; keep the COMPILED remat path covered on CPU-only
    hosts too (fusion/wiring regressions surface under jit)."""
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    base, v = tiny_v5
    rem = YOLOv5(num_class=4, spec=TINY, remat=True)

    def loss(params, model):
        outs, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return sum(jnp.sum(o * o) for o in outs)

    g_a = jax.jit(jax.grad(loss), static_argnums=1)(v["params"], base)
    g_b = jax.jit(jax.grad(loss), static_argnums=1)(v["params"], rem)
    _assert_grads_equal_mod_rounding(g_a, g_b)


@pytest.mark.slow
def test_yolov8_remat_grads_identical(rng):
    from yoloseries_tpu.models import YOLOv8

    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    base = YOLOv8(num_class=4, scale=0.25)
    rem = YOLOv8(num_class=4, scale=0.25, remat=True)
    v = base.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params, model):
        outs, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    g_a = jax.jit(jax.grad(loss), static_argnums=1)(v["params"], base)
    g_b = jax.jit(jax.grad(loss), static_argnums=1)(v["params"], rem)
    _assert_grads_equal_mod_rounding(g_a, g_b)
