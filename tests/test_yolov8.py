import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloseries_tpu.evaluation import decode_yolov8
from yoloseries_tpu.losses import YOLOv8LossConfig, yolov8_loss
from yoloseries_tpu.losses.yolov8 import dfl_decode, v8_make_grid


def make_preds(batch, size, nc, reg=16, rng=None, scale=0.1):
    out = []
    for s in (4, 8, 16, 32):
        shape = (batch, size // s, size // s, 4 * reg + nc)
        if rng is None:
            out.append(jnp.zeros(shape, jnp.float32))
        else:
            out.append(jnp.asarray(rng.normal(0, scale, shape).astype(np.float32)))
    return out


@pytest.mark.slow
def test_yolov8_model_shapes():
    from yoloseries_tpu.models import create_model

    m = create_model("yolov8", num_class=5, scale=0.5)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(v, x, train=False)
    assert len(outs) == 4
    assert outs[0].shape == (1, 16, 16, 64 + 5)  # /4
    assert outs[3].shape == (1, 2, 2, 64 + 5)  # /32
    # box bias prior = 1.0
    bias = np.asarray(v["params"]["head0"]["box_out"]["bias"])
    np.testing.assert_allclose(bias, 1.0)
    # cls bias prior = log(5/nc/(640/stride)^2)
    cb = np.asarray(v["params"]["head0"]["cls_out"]["bias"])
    np.testing.assert_allclose(cb, np.log(5 / 5 / (640 / 4) ** 2), rtol=1e-5)


def test_dfl_decode_projects_1_to_reg():
    """Uniform logits -> expected value (1 + reg) / 2 (1-indexed bins)."""
    reg = 16
    x = jnp.zeros((2, 3, 4 * reg))
    out = np.asarray(dfl_decode(x, reg))
    np.testing.assert_allclose(out, (1 + reg) / 2, rtol=1e-6)
    # peaked logits -> that bin value
    x = jnp.full((1, 1, 4 * reg), -20.0)
    x = x.at[..., 5].set(20.0)  # first tblr group, bin 5 -> value 6
    out = np.asarray(dfl_decode(x, reg))
    np.testing.assert_allclose(out[0, 0, 0], 6.0, atol=1e-3)


def test_v8_grid():
    grids, strides = v8_make_grid((64, 64), (4, 8, 16, 32))
    n = 16 * 16 + 8 * 8 + 4 * 4 + 2 * 2
    assert grids.shape == (n, 2)
    assert strides.shape == (n, 1)
    np.testing.assert_allclose(np.asarray(grids[0]), [0.5, 0.5])
    np.testing.assert_allclose(np.asarray(strides[-1]), [32.0])


def test_decode_yolov8_shapes():
    nc = 5
    preds = make_preds(2, 64, nc)
    out = np.asarray(decode_yolov8(preds, nc, (64, 64)))
    n = 16 * 16 + 8 * 8 + 4 * 4 + 2 * 2
    assert out.shape == (2, n, 5 + nc)
    # uniform DFL -> tblr = 8.5 grid units -> box 17x17 cells * stride
    np.testing.assert_allclose(out[0, 0, 2], 17 * 4, rtol=1e-5)  # w at /4
    np.testing.assert_allclose(out[0, :, 4], 1.0)  # obj placeholder


@pytest.mark.slow
def test_yolov8_loss_descends():
    size, nc = 64, 3
    cfg = YOLOv8LossConfig(num_class=nc, input_size=(size, size), image_chunk=2)
    rng = np.random.default_rng(0)
    preds = make_preds(2, size, nc, rng=rng)
    t = np.full((2, 4, 6), -1, dtype=np.float32)
    t[0, 0] = [8, 8, 50, 50, 1, 0]
    t[1, 0] = [16, 20, 60, 62, 2, 1]
    targets = jnp.asarray(t)
    balances = jnp.ones((1,))

    @jax.jit
    def step(preds):
        def f(ps):
            d, _ = yolov8_loss(ps, targets, balances, cfg)
            return d["tot_loss"]

        loss, grads = jax.value_and_grad(f)(preds)
        return loss, [p - 0.5 * g for p, g in zip(preds, grads)]

    losses = []
    for _ in range(15):
        loss, preds = step(preds)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0] * 0.9, losses


@pytest.mark.slow
def test_yolov8_loss_empty_targets():
    size, nc = 64, 3
    cfg = YOLOv8LossConfig(num_class=nc, input_size=(size, size), image_chunk=2)
    preds = make_preds(2, size, nc)
    t = jnp.full((2, 4, 6), -1.0)
    d, _ = yolov8_loss(preds, t, jnp.ones((1,)), cfg)
    assert np.isfinite(float(d["tot_loss"]))
    assert float(d["tar_nums"]) == 0


@pytest.mark.slow
def test_yolov8_family():
    from yoloseries_tpu.families import family_of, get_family

    assert family_of("yolov8") == "yolov8"
    assert family_of("yolov8s") == "yolov8"
    fam = get_family("yolov8")
    loss_fn, bal = fam.make_loss({}, 3, (64, 64))
    preds = make_preds(1, 64, 3)
    t = np.full((1, 4, 6), -1, dtype=np.float32)
    t[0, 0] = [8, 8, 50, 50, 1, 0]
    d, _ = loss_fn(preds, jnp.asarray(t), bal)
    assert np.isfinite(float(d["tot_loss"]))
    assert float(d["tar_nums"]) > 0
