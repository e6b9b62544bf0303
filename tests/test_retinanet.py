import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloseries_tpu.evaluation import decode_retinanet
from yoloseries_tpu.losses import RetinaNetLossConfig, retinanet_loss
from yoloseries_tpu.ops import pyramid_anchors


def test_pyramid_anchor_count():
    anchors = pyramid_anchors(np.array([64, 64]))
    # levels 3..7 on 64px: 8^2+4^2+2^2+1+1 cells x 9 anchors
    assert anchors.shape == ((64 + 16 + 4 + 1 + 1) * 9, 4)
    # base anchor areas scale as (2^(l+2) * scale)^2
    wh = anchors[:, 2:] - anchors[:, :2]
    assert (wh > 0).all()


@pytest.mark.slow
def test_retinanet_model_shapes():
    from yoloseries_tpu.models import create_model

    m = create_model("retinanet", num_class=4)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    reg, cls = m.apply(v, x, train=False)
    n = (64 + 16 + 4 + 1 + 1) * 9
    assert reg.shape == (1, n, 4)
    assert cls.shape == (1, n, 4)
    # focal prior on cls output bias
    bias = np.asarray(v["params"]["classification"]["out"]["bias"])
    np.testing.assert_allclose(1 / (1 + np.exp(-bias)), 0.01, rtol=1e-4)


@pytest.mark.slow
def test_retinanet_experiment_reg_dim():
    from yoloseries_tpu.models import create_model

    m = create_model("retinanet_experiment", num_class=4)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    reg, cls = m.apply(v, x, train=False)
    assert reg.shape[-1] == 5


def make_inputs(nc=4, size=64, batch=2, seed=0, with_obj=False):
    anchors = jnp.asarray(pyramid_anchors(np.array([size, size])))
    A = anchors.shape[0]
    rng = np.random.default_rng(seed)
    reg = jnp.asarray(rng.normal(0, 0.1, (batch, A, 5 if with_obj else 4)).astype(np.float32))
    cls = jnp.asarray(rng.normal(-2, 0.5, (batch, A, nc)).astype(np.float32))
    t = np.full((batch, 4, 6), -1, dtype=np.float32)
    t[0, 0] = [8, 8, 40, 40, 1, 0]
    t[0, 1] = [20, 30, 60, 62, 3, 0]
    t[1, 0] = [5, 5, 30, 30, 0, 1]
    return reg, cls, jnp.asarray(t), anchors


@pytest.mark.slow
def test_retinanet_loss_descends():
    nc = 4
    cfg = RetinaNetLossConfig(num_class=nc, image_chunk=2)
    reg, cls, targets, anchors = make_inputs(nc)

    @jax.jit
    def step(reg, cls):
        def f(r, c):
            return retinanet_loss(r, c, targets, anchors, cfg)["tot_loss"]

        loss, grads = jax.value_and_grad(f, argnums=(0, 1))(reg, cls)
        return loss, reg - 1.0 * grads[0], cls - 1.0 * grads[1]

    losses = []
    for _ in range(20):
        loss, reg, cls = step(reg, cls)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.8, losses


@pytest.mark.slow
def test_retinanet_loss_empty_targets():
    nc = 4
    cfg = RetinaNetLossConfig(num_class=nc, image_chunk=2)
    reg, cls, _, anchors = make_inputs(nc)
    t = jnp.full((2, 4, 6), -1.0)
    d = retinanet_loss(reg, cls, t, anchors, cfg)
    assert np.isfinite(float(d["tot_loss"]))
    assert float(d["tar_nums"]) == 0
    # classification still penalizes false positives
    assert float(d["cls_loss"]) > 0


@pytest.mark.slow
def test_retinanet_experiment_objectness():
    nc = 4
    cfg = RetinaNetLossConfig(num_class=nc, with_objectness=True, image_chunk=2)
    reg, cls, targets, anchors = make_inputs(nc, with_obj=True)
    d = retinanet_loss(reg, cls, targets, anchors, cfg)
    assert "cof_loss" in d
    assert np.isfinite(float(d["tot_loss"]))


def test_decode_retinanet_zero_deltas_recovers_anchors():
    nc = 4
    anchors = jnp.asarray(pyramid_anchors(np.array([64, 64])))
    A = anchors.shape[0]
    reg = jnp.zeros((1, A, 4))
    cls = jnp.zeros((1, A, nc))
    out = np.asarray(decode_retinanet(reg, cls, anchors))
    a = np.asarray(anchors)
    cx = (a[:, 0] + a[:, 2]) / 2
    w = a[:, 2] - a[:, 0]
    np.testing.assert_allclose(out[0, :, 0], cx, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(out[0, :, 2], w, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(out[0, :, 4], 1.0)  # obj placeholder
    np.testing.assert_allclose(out[0, :, 5:], 0.5)  # sigmoid(0)


@pytest.mark.slow
def test_family_adapter_retinanet():
    from yoloseries_tpu.families import family_of, get_family

    assert family_of("retinanet") == "retinanet"
    assert family_of("retinanet_experiment") == "retinanet_experiment"
    assert family_of("yolox_darknet53") == "yolox"
    assert family_of("yolov5s_dw") == "yolov5"

    fam = get_family("retinanet")
    loss_fn, bal = fam.make_loss({}, 4, (64, 64))
    reg, cls, targets, _ = make_inputs(4)
    d, bal2 = loss_fn((reg, cls), targets, bal)
    assert np.isfinite(float(d["tot_loss"]))
    decode = fam.make_decode({}, 4, (64, 64))
    out = decode((reg, cls))
    assert out.shape[-1] == 4 + 1 + 4
