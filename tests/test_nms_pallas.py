"""Pallas NMS kernel equivalence vs the XLA greedy reference.

On the CPU test runner the kernel executes in Pallas interpret mode; the
numerics/ordering contract is identical to the compiled TPU path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from yoloseries_tpu.kernels.nms_pallas import pallas_greedy_nms
from yoloseries_tpu.ops import greedy_nms


def random_batch(rng, b, k):
    xy = rng.uniform(0, 600, (b, k, 2))
    wh = rng.uniform(5, 80, (b, k, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.uniform(0, 1, (b, k)).astype(np.float32)
    scores[scores < 0.4] = 0.0
    return jnp.asarray(boxes), jnp.asarray(scores)


def test_pallas_nms_matches_xla_greedy(rng):
    boxes, scores = random_batch(rng, 4, 128)
    ki, kv = pallas_greedy_nms(boxes, scores, 0.45, max_keep=64, interpret=True)
    ref_i, ref_v = jax.vmap(lambda b, s: greedy_nms(b, s, 0.45, 64))(boxes, scores)
    np.testing.assert_array_equal(np.asarray(kv), np.asarray(ref_v))
    np.testing.assert_array_equal(
        np.asarray(ki), np.where(np.asarray(ref_v), np.asarray(ref_i), -1)
    )


def test_pallas_nms_empty_scores(rng):
    boxes, scores = random_batch(rng, 2, 128)
    scores = jnp.zeros_like(scores)
    ki, kv = pallas_greedy_nms(boxes, scores, 0.5, max_keep=32, interpret=True)
    assert not np.asarray(kv).any()
    assert (np.asarray(ki) == -1).all()


def test_pallas_nms_batch_padding(rng):
    """Batch not a multiple of tile_b is padded internally."""
    boxes, scores = random_batch(rng, 3, 128)
    ki, kv = pallas_greedy_nms(boxes, scores, 0.45, max_keep=16, tile_b=8,
                               interpret=True)
    assert ki.shape == (3, 16)
    ref_i, ref_v = jax.vmap(lambda b, s: greedy_nms(b, s, 0.45, 16))(boxes, scores)
    np.testing.assert_array_equal(np.asarray(kv), np.asarray(ref_v))


def test_batched_postprocess_matches_single(rng):
    """postprocess_detections batched == per-image results (XLA path)."""
    from yoloseries_tpu.ops import postprocess_detections

    pred = rng.uniform(0, 1, (3, 256, 10)).astype(np.float32)
    pred[..., :4] *= 300
    batched = postprocess_detections(
        jnp.asarray(pred), 0.25, 0.1, 0.5, num_candidates=64, max_keep=20
    )
    singles = [
        postprocess_detections(
            jnp.asarray(pred[i]), 0.25, 0.1, 0.5, num_candidates=64, max_keep=20
        )
        for i in range(3)
    ]
    np.testing.assert_allclose(
        np.asarray(batched), np.stack([np.asarray(s) for s in singles]),
        rtol=1e-5, atol=1e-5,
    )
