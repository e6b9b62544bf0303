import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloseries_tpu.models import YOLOV5_SIZES, available_models, create_model


def init_and_run(name, num_class=80, size=128, batch=1):
    m = create_model(name, num_class=num_class)
    x = jnp.zeros((batch, size, size, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    outs = m.apply(variables, x, train=False)
    return m, variables, outs


def test_registry_contains_all_sizes():
    names = available_models()
    for size in YOLOV5_SIZES:
        assert f"yolov5{size}" in names


@pytest.mark.slow
def test_yolov5s_output_shapes():
    _, _, outs = init_and_run("yolov5s", num_class=80, size=128, batch=2)
    assert len(outs) == 3
    assert outs[0].shape == (2, 16, 16, 3 * 85)
    assert outs[1].shape == (2, 8, 8, 3 * 85)
    assert outs[2].shape == (2, 4, 4, 3 * 85)


@pytest.mark.slow
def test_yolov5s_param_count_matches_reference():
    """The reference YOLOv5s at nc=80 has exactly 7,235,389 parameters
    (models/normal/yolov5s.py graph)."""
    _, variables, _ = init_and_run("yolov5s", num_class=80)
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert n == 7_235_389


@pytest.mark.parametrize("name", ["yolov5m", "yolov5s_dw", "yolov5s_plain"])
@pytest.mark.slow
def test_other_sizes_forward(name):
    _, _, outs = init_and_run(name, num_class=3, size=64)
    assert outs[0].shape == (1, 8, 8, 3 * 8)
    assert outs[2].shape == (1, 2, 2, 3 * 8)


@pytest.mark.slow
def test_detect_bias_prior():
    """Objectness bias init: log(8/(512/stride)^2) (yolov5s.py:67-76)."""
    _, variables, _ = init_and_run("yolov5s", num_class=80)
    b = np.asarray(variables["params"]["detect"]["detect_0"]["bias"]).reshape(3, 85)
    np.testing.assert_allclose(b[:, 4], np.log(8 / (512 / 8) ** 2), rtol=1e-5)
    np.testing.assert_allclose(b[:, 5:], np.log(0.6 / (80 - 0.99)), rtol=1e-5)
    assert np.all(b[:, :4] == 0)


@pytest.mark.slow
def test_train_mode_updates_batch_stats():
    m = create_model("yolov5s", num_class=3)
    x = jnp.ones((1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    _, updates = m.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    old = variables["batch_stats"]["trunk"]["stem"]["bn"]["mean"]
    new = updates["batch_stats"]["trunk"]["stem"]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


@pytest.mark.slow
def test_jit_forward():
    m, variables, _ = init_and_run("yolov5s", num_class=3, size=64)

    @jax.jit
    def fwd(v, x):
        return m.apply(v, x, train=False)

    outs = fwd(variables, jnp.ones((1, 64, 64, 3)))
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
