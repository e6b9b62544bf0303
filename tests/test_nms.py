import numpy as np
import jax
import jax.numpy as jnp

from yoloseries_tpu.ops import greedy_nms, postprocess_detections, soft_nms


def reference_greedy_nms(boxes, scores, iou_threshold):
    """Pure-python greedy NMS with the reference's semantics
    (argmax-suppress loop, suppression at IoU >= threshold)."""
    scores = scores.copy()
    keep = []
    while scores.sum() > 0:
        i = int(np.argmax(scores))
        keep.append(i)
        scores[i] = 0.0
        # iou of box i vs all
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
        a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        ious = inter / np.clip(a1 + a2 - inter, 1e-9, None)
        scores[ious >= iou_threshold] = 0.0
    return keep


def random_boxes(rng, n):
    xy = rng.uniform(0, 200, size=(n, 2))
    wh = rng.uniform(5, 80, size=(n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, size=(n,)).astype(np.float32)
    return boxes, scores


def test_greedy_nms_matches_reference(rng):
    for trial in range(5):
        boxes, scores = random_boxes(rng, 100)
        expected = reference_greedy_nms(boxes, scores, 0.5)
        keep_idx, keep_valid = greedy_nms(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_keep=100
        )
        got = np.asarray(keep_idx)[np.asarray(keep_valid)].tolist()
        assert got == expected, f"trial {trial}: {got} != {expected}"


def test_greedy_nms_max_keep_truncates(rng):
    boxes, scores = random_boxes(rng, 200)
    keep_idx, keep_valid = greedy_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.99, max_keep=10
    )
    assert keep_valid.sum() == 10


def test_greedy_nms_ignores_zero_scores(rng):
    boxes, scores = random_boxes(rng, 50)
    scores[10:] = 0.0
    keep_idx, keep_valid = greedy_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_keep=50
    )
    kept = np.asarray(keep_idx)[np.asarray(keep_valid)]
    assert np.all(kept < 10)


def test_soft_nms_decays_overlapping(rng):
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [100, 100, 110, 110]], dtype=np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    keep_idx, keep_valid, keep_scores = soft_nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.3, max_keep=3, mode="linear"
    )
    kept = np.asarray(keep_idx)[np.asarray(keep_valid)]
    # all three eventually selected; the overlapped one with decayed score
    assert 0 in kept and 2 in kept
    ks = np.asarray(keep_scores)[np.asarray(keep_valid)]
    assert ks[0] == 0.9


def test_postprocess_detections_end_to_end(rng):
    n, nc = 400, 5
    pred = np.zeros((n, 5 + nc), dtype=np.float32)
    pred[:, 0:2] = rng.uniform(50, 500, size=(n, 2))
    pred[:, 2:4] = rng.uniform(10, 60, size=(n, 2))
    pred[:, 4] = rng.uniform(0, 1, size=n)
    pred[:, 5:] = rng.dirichlet(np.ones(nc), size=n)
    out = postprocess_detections(
        jnp.asarray(pred),
        conf_threshold=0.3,
        cls_threshold=0.1,
        iou_threshold=0.5,
        num_candidates=256,
        max_keep=50,
        merge_boxes=False,
    )
    out = np.asarray(out)
    assert out.shape == (50, 6)
    valid = out[:, 4] > 0
    assert valid.sum() > 0
    # boxes are xyxy
    assert np.all(out[valid, 2] >= out[valid, 0])
    assert np.all(out[valid, 3] >= out[valid, 1])
    # classes in range
    assert np.all(out[valid, 5] >= 0) and np.all(out[valid, 5] < nc)
    # scores sorted descending among valid slots
    vs = out[valid, 4]
    assert np.all(np.diff(vs) <= 1e-6)


def test_postprocess_is_jit_and_vmap_safe(rng):
    n, nc = 128, 3
    pred = rng.uniform(0, 1, size=(2, n, 5 + nc)).astype(np.float32)
    pred[..., 0:4] *= 300
    fn = jax.vmap(
        lambda p: postprocess_detections(
            p, 0.25, 0.1, 0.5, num_candidates=64, max_keep=20
        )
    )
    out = fn(jnp.asarray(pred))
    assert out.shape == (2, 20, 6)
