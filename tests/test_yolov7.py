import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloseries_tpu.losses import YOLOv7LossConfig, yolov7_loss
from yoloseries_tpu.ops import YOLOV5_ANCHORS

ANCHORS = jnp.asarray(YOLOV5_ANCHORS)


def make_preds(batch, size, nc, rng=None, scale=0.1):
    out = []
    for s in (8, 16, 32):
        shape = (batch, size // s, size // s, 3 * (5 + nc))
        if rng is None:
            out.append(jnp.zeros(shape, jnp.float32))
        else:
            out.append(jnp.asarray(rng.normal(0, scale, shape).astype(np.float32)))
    return out


@pytest.mark.slow
def test_yolov7_model_shapes():
    from yoloseries_tpu.models import create_model

    m = create_model("yolov7", num_class=3)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(v, x, train=False)
    assert outs[0].shape == (1, 8, 8, 24)
    assert outs[1].shape == (1, 4, 4, 24)
    assert outs[2].shape == (1, 2, 2, 24)
    # implicit params exist
    assert "ia_0" in v["params"] and "im_2" in v["params"]
    # v7 detect bias prior (640 reference size)
    b = np.asarray(v["params"]["detect_0"]["bias"]).reshape(3, 8)
    np.testing.assert_allclose(b[:, 4], np.log(8 / (640 / 8) ** 2), rtol=1e-5)


@pytest.mark.slow
def test_yolov7_loss_subset_of_v5_candidates():
    """OTA refinement can only keep v5-matched candidates: tar_nums(v7) <=
    tar_nums(v5) on the same inputs."""
    from yoloseries_tpu.losses import YOLOv5LossConfig, initial_balances, yolov5_loss

    size, nc = 64, 3
    rng = np.random.default_rng(0)
    preds = make_preds(1, size, nc, rng)
    t = np.full((1, 4, 6), -1, dtype=np.float32)
    t[0, 0] = [0.2, 0.2, 64.2, 64.2, 1, 0]
    targets = jnp.asarray(t)

    cfg7 = YOLOv7LossConfig(num_class=nc, input_size=(size, size), image_chunk=1)
    d7, _ = yolov7_loss(preds, targets, ANCHORS, initial_balances(), cfg7)
    cfg5 = YOLOv5LossConfig(num_class=nc, input_size=(size, size))
    d5, _ = yolov5_loss(preds, targets, ANCHORS, initial_balances(), cfg5)
    assert 0 < float(d7["tar_nums"]) <= float(d5["tar_nums"])


@pytest.mark.slow
def test_yolov7_loss_descends():
    from yoloseries_tpu.losses import initial_balances

    size, nc = 64, 3
    cfg = YOLOv7LossConfig(num_class=nc, input_size=(size, size), image_chunk=2)
    rng = np.random.default_rng(0)
    preds = make_preds(2, size, nc, rng, scale=0.3)
    t = np.full((2, 4, 6), -1, dtype=np.float32)
    t[0, 0] = [8, 8, 50, 50, 1, 0]
    t[1, 0] = [16, 20, 60, 62, 2, 1]
    targets = jnp.asarray(t)

    @jax.jit
    def step(preds):
        def f(ps):
            d, _ = yolov7_loss(ps, targets, ANCHORS, initial_balances(), cfg)
            return d["tot_loss"]

        loss, grads = jax.value_and_grad(f)(preds)
        return loss, [p - 1.0 * g for p, g in zip(preds, grads)]

    losses = []
    for _ in range(15):
        loss, preds = step(preds)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_yolov7_loss_empty_targets():
    from yoloseries_tpu.losses import initial_balances

    size, nc = 64, 3
    cfg = YOLOv7LossConfig(num_class=nc, input_size=(size, size), image_chunk=2)
    preds = make_preds(2, size, nc)
    t = jnp.full((2, 4, 6), -1.0)
    d, nb = yolov7_loss(preds, t, ANCHORS, initial_balances(), cfg)
    assert np.isfinite(float(d["tot_loss"]))
    assert float(d["tar_nums"]) == 0


@pytest.mark.slow
def test_yolov7_family():
    from yoloseries_tpu.families import family_of

    assert family_of("yolov7") == "yolov7"
