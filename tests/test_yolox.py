import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloseries_tpu.evaluation import decode_yolox
from yoloseries_tpu.losses import YOLOXLossConfig, yolox_initial_balances, yolox_loss
from yoloseries_tpu.losses.yolox import _simota_assign_image


def make_preds(batch, size, nc, rng=None, scale=0.1):
    out = []
    for s in (8, 16, 32):
        shape = (batch, size // s, size // s, 5 + nc)
        if rng is None:
            out.append(jnp.zeros(shape, jnp.float32))
        else:
            out.append(jnp.asarray(rng.normal(0, scale, shape).astype(np.float32)))
    return out


@pytest.mark.slow
def test_yolox_model_shapes():
    from yoloseries_tpu.models import create_model

    m = create_model("yolox_s", num_class=5)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(v, x, train=False)
    assert outs[0].shape == (1, 8, 8, 10)
    assert outs[1].shape == (1, 4, 4, 10)
    assert outs[2].shape == (1, 2, 2, 10)
    # cls bias prior: sigmoid(bias) ~ 0.01
    bias = np.asarray(v["params"]["head0"]["cls"]["bias"])
    np.testing.assert_allclose(1 / (1 + np.exp(-bias)), 0.01, rtol=1e-4)


@pytest.mark.slow
def test_yolox_darknet_shapes():
    from yoloseries_tpu.models import create_model

    m = create_model("yolox_darknet21", num_class=3)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(v, x, train=False)
    assert outs[0].shape == (1, 8, 8, 8)
    assert outs[2].shape == (1, 2, 2, 8)


def test_decode_yolox_golden():
    size, nc = 64, 3
    preds = make_preds(1, size, nc)
    out = np.asarray(decode_yolox(preds, nc))
    # zero logits: xy = grid*stride (cell corners), wh = stride
    np.testing.assert_allclose(out[0, 0, 0:2], [0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(out[0, 0, 2:4], [8.0, 8.0], atol=1e-5)
    np.testing.assert_allclose(out[0, 1, 0:2], [8.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(out[0, :, 4], 0.5, atol=1e-6)


@pytest.mark.slow
def test_simota_assign_centered_box():
    """A 32x32 gt centered at (32, 32) on an 8x8 grid of stride 8: candidate
    cells are those whose centers fall inside the box; dynamic-k selects at
    least one."""
    nc = 3
    cfg = YOLOXLossConfig(num_class=nc, input_size=(64, 64))
    P = 64
    ys, xs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    ctr_grid = ((np.stack([xs, ys], -1).reshape(-1, 2) + 0.5) * 8).astype(np.float32)

    gt_xywh = jnp.asarray([[32.0, 32.0, 32.0, 32.0], [0, 0, 0, 0]])
    gt_cls = jnp.asarray([1, 0])
    gt_valid = jnp.asarray([True, False])
    pred = jnp.zeros((P, 5 + nc))
    # predictions at cell positions, wh=16 → some IoU with the gt
    pred = pred.at[:, 0:2].set(jnp.asarray(ctr_grid))
    pred = pred.at[:, 2:4].set(16.0)

    fg, tar_box, tar_cls, matched_iou = _simota_assign_image(
        gt_xywh, gt_cls, gt_valid, pred, None, jnp.asarray(ctr_grid), cfg
    )
    fg = np.asarray(fg)
    assert fg.sum() >= 1
    # all fg cells have centers inside the gt box (16..48)
    fg_centers = ctr_grid[fg]
    assert (fg_centers >= 16).all() and (fg_centers <= 48).all()
    # targets point at gt 0 (class 1)
    tc = np.asarray(tar_cls)[fg]
    assert (tc.argmax(-1) == 1).all()
    expected = np.tile([32.0, 32.0, 32.0, 32.0], (int(fg.sum()), 1))
    np.testing.assert_allclose(np.asarray(tar_box)[fg], expected)


@pytest.mark.slow
def test_simota_no_valid_gt():
    nc = 3
    cfg = YOLOXLossConfig(num_class=nc, input_size=(64, 64))
    ctr_grid = jnp.asarray(np.random.default_rng(0).uniform(0, 64, (64, 2)).astype(np.float32))
    fg, *_ = _simota_assign_image(
        jnp.zeros((2, 4)), jnp.zeros(2, jnp.int32), jnp.zeros(2, bool),
        jnp.zeros((64, 5 + nc)), None, ctr_grid, cfg,
    )
    assert not np.asarray(fg).any()


@pytest.mark.slow
def test_yolox_loss_finite_and_descends():
    size, nc = 64, 3
    cfg = YOLOXLossConfig(num_class=nc, input_size=(size, size), image_chunk=2)
    rng = np.random.default_rng(0)
    preds = make_preds(2, size, nc, rng)
    t = np.full((2, 4, 6), -1, dtype=np.float32)
    t[0, 0] = [10, 10, 50, 50, 1, 0]
    t[1, 0] = [20, 20, 60, 60, 2, 1]
    targets = jnp.asarray(t)

    @jax.jit
    def step(preds):
        def f(ps):
            d, _ = yolox_loss(ps, targets, yolox_initial_balances(), cfg)
            return d["tot_loss"]

        loss, grads = jax.value_and_grad(f)(preds)
        return loss, [p - 0.5 * g for p, g in zip(preds, grads)]

    losses = []
    for _ in range(15):
        loss, preds = step(preds)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9, losses


@pytest.mark.slow
def test_yolox_loss_empty_targets():
    size, nc = 64, 3
    cfg = YOLOXLossConfig(num_class=nc, input_size=(size, size), image_chunk=2)
    preds = make_preds(2, size, nc)
    t = np.full((2, 4, 6), -1, dtype=np.float32)
    d, nb = yolox_loss(preds, jnp.asarray(t), yolox_initial_balances(), cfg)
    assert np.isfinite(float(d["tot_loss"]))
    assert float(d["fg_nums"]) == 0
    assert abs(float(nb[1]) - 1.0) < 1e-6
