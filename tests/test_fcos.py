import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloseries_tpu.evaluation import decode_fcos
from yoloseries_tpu.losses import FCOSLossConfig, fcos_loss
from yoloseries_tpu.losses.fcos import _regression_ranges


def make_preds(batch, size, nc, levels=(8, 16, 32, 64, 128), rng=None, scale=0.1):
    cls_fms, reg_fms, ctr_fms = [], [], []
    for s in levels:
        h = max(size // s, 1)
        shapes = [(batch, h, h, nc), (batch, h, h, 4), (batch, h, h, 1)]
        for lst, shp in zip((cls_fms, reg_fms, ctr_fms), shapes):
            if rng is None:
                lst.append(jnp.zeros(shp, jnp.float32))
            else:
                lst.append(jnp.asarray(rng.normal(0, scale, shp).astype(np.float32)))
    # reg must be non-negative (post-relu in the model)
    reg_fms = [jnp.abs(r) + 0.5 for r in reg_fms]
    return cls_fms, reg_fms, ctr_fms


def test_regression_ranges():
    r = _regression_ranges(5, (8, 16, 32, 64, 128))
    assert r[0] == (-1.0, 64.0)
    assert r[1] == (64.0, 128.0)
    assert r[3] == (256.0, 512.0)
    assert r[4][0] == 512.0 and r[4][1] > 1e7


@pytest.mark.slow
def test_fcos_model_shapes():
    from yoloseries_tpu.models import create_model

    m = create_model("fcos", num_class=3)
    x = jnp.zeros((1, 128, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert "batch_stats" not in v  # GroupNorm backbone: stateless
    cls_fms, reg_fms, ctr_fms = m.apply(v, x, train=False)
    assert len(cls_fms) == 5
    assert cls_fms[0].shape == (1, 16, 16, 3)
    assert reg_fms[0].shape == (1, 16, 16, 4)
    assert ctr_fms[4].shape == (1, 1, 1, 1)
    # reg output is post-relu
    assert all(float(jnp.min(r)) >= 0 for r in reg_fms)
    # focal prior on cls bias
    b = np.asarray(v["params"]["head"]["cls_out"]["bias"])
    np.testing.assert_allclose(1 / (1 + np.exp(-b)), 0.01, rtol=1e-4)


@pytest.mark.slow
def test_fcos_cspnet_three_levels():
    from yoloseries_tpu.models import create_model

    m = create_model("fcos_cspnet", num_class=3)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    cls_fms, reg_fms, ctr_fms = m.apply(v, x, train=False)
    assert len(cls_fms) == 3
    assert cls_fms[0].shape == (1, 8, 8, 3)


@pytest.mark.slow
def test_fcos_loss_descends():
    # 3 levels at 64px: same code path as the 5-level config, much cheaper
    # to compile on the CPU test runner
    size, nc = 64, 3
    cfg = FCOSLossConfig(
        num_class=nc, input_size=(size, size), strides=(8, 16, 32),
        image_chunk=2,
    )
    rng = np.random.default_rng(0)
    cls_fms, reg_fms, ctr_fms = make_preds(2, size, nc, levels=(8, 16, 32), rng=rng)
    t = np.full((2, 4, 6), -1, dtype=np.float32)
    t[0, 0] = [16, 16, 50, 55, 1, 0]
    t[1, 0] = [10, 20, 60, 60, 2, 1]
    targets = jnp.asarray(t)

    @jax.jit
    def step(preds):
        def f(ps):
            return fcos_loss(ps[0], ps[1], ps[2], targets, cfg)["tot_loss"]

        loss, grads = jax.value_and_grad(f)(preds)
        return loss, grads

    preds = (cls_fms, reg_fms, ctr_fms)
    losses = []
    for _ in range(15):
        loss, grads = step(preds)
        preds = jax.tree.map(lambda p, g: p - 0.2 * g, preds, grads)
        # the model emits reg through a relu; project the descent iterate
        # back onto that constraint set (raw steps can go negative)
        preds = (preds[0], [jnp.clip(r, 0.0) for r in preds[1]], preds[2])
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    # focal-factored BCE descends gently; require strict monotone progress
    assert losses[-1] < losses[0] - 0.01, losses


@pytest.mark.slow
def test_fcos_loss_empty_targets():
    size, nc = 128, 3
    cfg = FCOSLossConfig(num_class=nc, input_size=(size, size), image_chunk=2)
    cls_fms, reg_fms, ctr_fms = make_preds(2, size, nc)
    t = jnp.full((2, 4, 6), -1.0)
    d = fcos_loss(cls_fms, reg_fms, ctr_fms, t, cfg)
    assert np.isfinite(float(d["tot_loss"]))
    assert float(d["tar_nums"]) == 0


@pytest.mark.slow
def test_fcos_level_assignment():
    """A 48x48 box (max ltrb < 64) must land on level 0 only."""
    size, nc = 128, 2
    cfg = FCOSLossConfig(num_class=nc, input_size=(size, size), image_chunk=1)
    cls_fms, reg_fms, ctr_fms = make_preds(1, size, nc)
    t = np.full((1, 2, 6), -1, dtype=np.float32)
    t[0, 0] = [40, 40, 88, 88, 0, 0]
    d = fcos_loss(cls_fms, reg_fms, ctr_fms, jnp.asarray(t), cfg)
    assert float(d["tar_nums"]) > 0
    # now a big box (max ltrb > 64 at its center) contributes to higher levels
    t2 = np.full((1, 2, 6), -1, dtype=np.float32)
    t2[0, 0] = [0, 0, 128, 128, 0, 0]
    d2 = fcos_loss(cls_fms, reg_fms, ctr_fms, jnp.asarray(t2), cfg)
    assert float(d2["tar_nums"]) > 0


@pytest.mark.slow
def test_decode_fcos_golden():
    size, nc = 64, 2
    cls_fms, reg_fms, ctr_fms = make_preds(1, size, nc, levels=(8, 16, 32))
    # reg_fms are all 0.5 after abs()+0.5 of zeros
    out = np.asarray(decode_fcos(cls_fms, reg_fms, ctr_fms, (size, size)))
    # first level stride 8: first cell center (4, 4), ltrb=0.5*8=4 -> box 8x8 at (4,4)
    np.testing.assert_allclose(out[0, 0, 0:2], [4.0, 4.0], atol=1e-5)
    np.testing.assert_allclose(out[0, 0, 2:4], [8.0, 8.0], atol=1e-5)
    np.testing.assert_allclose(out[0, :, 4], 0.5, atol=1e-6)


@pytest.mark.slow
def test_fcos_family():
    from yoloseries_tpu.families import family_of, get_family

    assert family_of("fcos") == "fcos"
    assert family_of("fcos_cspnet") == "fcos"
    fam = get_family("fcos")
    loss_fn, bal = fam.make_loss({}, 2, (128, 128))
    preds = make_preds(1, 128, 2)
    t = np.full((1, 2, 6), -1, dtype=np.float32)
    t[0, 0] = [16, 16, 80, 90, 1, 0]
    d, _ = loss_fn(preds, jnp.asarray(t), bal)
    assert np.isfinite(float(d["tot_loss"]))
