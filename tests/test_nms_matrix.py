"""Matrix NMS kernel (kernels/nms_matrix.py) == sequential greedy semantics.

The kernel must match ops/nms.py:greedy_nms (itself keep-order-parity
tested against the executed reference numba_nms) on clustered boxes, dead
slots, zero-area boxes, exact score ties, truncation, and UNSORTED inputs
(the TTA path concatenates per-branch sorted blocks). Runs in interpret
mode so it executes everywhere; the on-chip path is exercised through the
Evaluator in the eval-oracle suites.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloseries_tpu.kernels.nms_matrix import (
    pallas_matrix_nms,
    pallas_matrix_nms_chunked,
)
from yoloseries_tpu.ops.nms import greedy_nms


def make_candidates(rng, b, k, shuffle):
    xy = rng.uniform(0, 600, (b, k, 2)).astype(np.float32)
    hot = rng.uniform(0, 600, (b, 20, 2)).astype(np.float32)
    pick = rng.integers(0, 20, (b, k))
    cluster = hot[np.arange(b)[:, None], pick] + rng.normal(0, 15, (b, k, 2))
    use_c = rng.uniform(size=(b, k)) < 0.7
    xy = np.where(use_c[..., None], cluster, xy).astype(np.float32)
    wh = rng.uniform(5, 90, (b, k, 2)).astype(np.float32)
    wh[:, ::37] = 0.0  # zero-area boxes (self-IoU 0)
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = np.sort(
        rng.uniform(0.01, 1, (b, k)).astype(np.float32), axis=1
    )[:, ::-1].copy()
    scores[:, 5:9] = scores[:, 5:6]  # exact ties
    scores[:, rng.integers(k // 4, k + 1):] = 0.0  # dead slots
    if shuffle:
        order = np.argsort(rng.uniform(size=k) + (np.arange(k) % 2))
        boxes, scores = boxes[:, order], scores[:, order]
    return jnp.asarray(boxes), jnp.asarray(scores)


@pytest.mark.parametrize(
    "b,k,shuffle", [(1, 512, False), (4, 256, True), (2, 128, True),
                    (1, 1024, False), (8, 512, True)]
)
def test_matrix_nms_matches_greedy(rng, b, k, shuffle):
    boxes, scores = make_candidates(rng, b, k, shuffle)
    for max_keep in (50, 300):
        ki_ref, kv_ref = jax.vmap(
            lambda bb, ss: greedy_nms(bb, ss, 0.5, max_keep)
        )(boxes, scores)
        ki, kv = pallas_matrix_nms(boxes, scores, 0.5, max_keep=max_keep,
                                   interpret=True)
        np.testing.assert_array_equal(
            np.where(np.asarray(kv_ref), np.asarray(ki_ref), -1),
            np.where(np.asarray(kv), np.asarray(ki), -1),
        )


@pytest.mark.parametrize(
    "b,k,shuffle,chunk", [
        (2, 4096, False, 1024),   # the certified eval-protocol shape
        (2, 4096, True, 1024),    # unsorted (TTA concatenation) input
        (1, 2500, True, 1024),    # K not a multiple of the strip width
        (4, 1024, True, 256),     # many small strips, heavy carry traffic
    ]
)
def test_chunked_matrix_nms_matches_greedy(rng, b, k, shuffle, chunk):
    """Strip-tiled large-K path (the K>1024 dispatch in nms_candidates):
    keep set AND keep order must be index-exact vs sequential greedy."""
    boxes, scores = make_candidates(rng, b, k, shuffle)
    for max_keep in (50, 300):
        ki_ref, kv_ref = jax.vmap(
            lambda bb, ss: greedy_nms(bb, ss, 0.5, max_keep)
        )(boxes, scores)
        ki, kv = pallas_matrix_nms_chunked(
            boxes, scores, 0.5, max_keep=max_keep, chunk=chunk,
            interpret=True,
        )
        np.testing.assert_array_equal(
            np.where(np.asarray(kv_ref), np.asarray(ki_ref), -1),
            np.where(np.asarray(kv), np.asarray(ki), -1),
        )


def test_chunked_matrix_nms_dense_cluster(rng):
    """Deep suppression chains that cross strip boundaries: every candidate
    clusters around 6 hot spots so strip-1+ candidates are mostly killed by
    carried keepers, and ties span strips."""
    b, k = 2, 2048
    hot = rng.uniform(100, 500, (b, 6, 2)).astype(np.float32)
    pick = rng.integers(0, 6, (b, k))
    xy = (hot[np.arange(b)[:, None], pick]
          + rng.normal(0, 8, (b, k, 2))).astype(np.float32)
    wh = rng.uniform(20, 60, (b, k, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    scores = rng.uniform(0.01, 1, (b, k)).astype(np.float32)
    scores[:, 1000:1060] = scores[:, 1000:1001]  # tie plateau across strips
    scores = jnp.asarray(scores)
    ki_ref, kv_ref = jax.vmap(
        lambda bb, ss: greedy_nms(bb, ss, 0.5, 300)
    )(boxes, scores)
    ki, kv = pallas_matrix_nms_chunked(boxes, scores, 0.5, max_keep=300,
                                       chunk=1024, interpret=True)
    np.testing.assert_array_equal(
        np.where(np.asarray(kv_ref), np.asarray(ki_ref), -1),
        np.where(np.asarray(kv), np.asarray(ki), -1),
    )


def test_matrix_nms_all_dead(rng):
    boxes = jnp.asarray(rng.uniform(0, 100, (2, 128, 4)).astype(np.float32))
    scores = jnp.zeros((2, 128), jnp.float32)
    ki, kv = pallas_matrix_nms(boxes, scores, 0.5, max_keep=30,
                               interpret=True)
    assert not bool(np.asarray(kv).any())
    assert (np.asarray(ki) == -1).all()
