"""Certify the protocol pre-NMS candidate cap (VERDICT round-2 item 4).

The production `evaluate()` path runs the fused select with
`num_candidates` = 4096 (EvalConfig default, YAML `eval_num_candidates`),
while the reference ships every above-threshold row to its host NMS. On
detection-DENSE inputs (thousands of rows past the .001 gates — the regime
the round-2 verdict flagged) the capped path must still produce the same
detections / mAP as the uncapped one: NMS keeps at most `max_keep` = 300
rows, all drawn from the very top of the score ordering, so a cap well
above max_keep only drops candidates that could never be kept — but WOULD
be visible to the supporter-count merge filter, which is why this is
certified rather than assumed.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from yoloseries_tpu.ops import postprocess_detections
from yoloseries_tpu.ops.metrics import DetectionMetrics


def dense_preds(batch=2, n=25200, nc=8, seed=11, frac_live=0.5):
    """(B, N, 5+nc) decoded rows where ~frac_live*N pass the .001 gates:
    clustered boxes (supporters) + uniform background."""
    rng = np.random.default_rng(seed)
    pred = np.zeros((batch, n, 5 + nc), np.float32)
    # centers: 60% clustered around 40 hotspots, 40% uniform
    hot = rng.uniform(60, 580, (40, 2))
    pick = rng.integers(0, 40, (batch, n))
    jitter = rng.normal(0, 12, (batch, n, 2))
    uniform = rng.uniform(0, 640, (batch, n, 2))
    clustered = hot[pick] + jitter
    use_cluster = rng.uniform(size=(batch, n)) < 0.6
    pred[..., 0:2] = np.where(use_cluster[..., None], clustered, uniform)
    pred[..., 2:4] = rng.uniform(10, 80, (batch, n, 2))
    live = rng.uniform(size=(batch, n)) < frac_live
    # obj in [.05, 1] for live rows, ~0 for dead; cls probs sum near 1
    pred[..., 4] = np.where(live, rng.uniform(0.05, 1.0, (batch, n)), 1e-5)
    cls = rng.dirichlet(np.ones(nc), (batch, n)).astype(np.float32)
    pred[..., 5:] = cls
    return jnp.asarray(pred)


def run(pred, k):
    return np.asarray(postprocess_detections(
        pred, conf_threshold=0.001, cls_threshold=0.001, iou_threshold=0.65,
        num_candidates=k, max_keep=300, class_aware=True, merge_boxes=True,
    ))


def _rows(out):
    r = out[out[:, 4] > 0]
    order = np.lexsort((r[:, 0], r[:, 5], -r[:, 4]))
    return r[order]


def test_capped_matches_uncapped_detections_dense():
    pred = dense_preds()
    n_live = int((np.asarray(pred)[..., 4] > 0.01).sum(axis=1).min())
    assert n_live > 8000, f"fixture not dense enough ({n_live})"
    capped = run(pred, 4096)
    uncapped = run(pred, pred.shape[1])  # no cap: every row eligible
    for b in range(capped.shape[0]):
        c, u = _rows(capped[b]), _rows(uncapped[b])
        assert abs(len(c) - len(u)) <= max(1, int(0.02 * len(u))), (
            f"count {len(c)} vs {len(u)}"
        )
        m = min(len(c), len(u))
        np.testing.assert_allclose(c[:m], u[:m], rtol=1e-5, atol=1e-4)


def test_capped_map_delta_negligible():
    pred = dense_preds(seed=13)
    rng = np.random.default_rng(13)
    maps = []
    for k in (4096, pred.shape[1]):
        out = run(pred, k)
        m = DetectionMetrics()
        r = np.random.default_rng(99)
        for b in range(out.shape[0]):
            n = r.integers(3, 8)
            xy = r.uniform(0, 560, (n, 2))
            wh = r.uniform(20, 80, (n, 2))
            gt = np.concatenate([xy, xy + wh, r.integers(0, 8, (n, 1))], 1)
            d = out[b][out[b][:, 4] > 0]
            m.add_image(gt, d if len(d) else None)
        maps.append(m.compute()["map50"])
    assert abs(maps[0] - maps[1]) < 0.005, maps


def test_merge_gate_disables_refinement_when_dense():
    """Above the reference's `bbox_num < 3000` gate the supporter filter
    and merged-box write-back must both switch OFF (eval_yolov5.py:307)."""
    # 3500 identical-score isolated boxes: every keeper would fail the
    # >=2-supporter filter, so if the gate malfunctions the output is empty
    rng = np.random.default_rng(3)
    n, nc = 4000, 4
    pred = np.zeros((1, n, 5 + nc), np.float32)
    side = int(np.ceil(np.sqrt(n)))
    ii = np.arange(n)
    pred[0, :, 0] = (ii % side) * 200.0 + 50
    pred[0, :, 1] = (ii // side) * 200.0 + 50
    pred[0, :, 2:4] = 20.0
    pred[0, :, 4] = 0.9
    pred[0, :, 5] = 1.0  # all class 0
    out = run(jnp.asarray(pred), 4096)[0]
    kept = out[out[:, 4] > 0]
    # gate open (n >= 3000): no supporter filter -> max_keep singletons kept
    assert len(kept) == 300, len(kept)

    # same geometry but only 100 live rows: gate closed -> filter ACTIVE,
    # singletons (1 supporter: self) are dropped
    pred2 = pred.copy()
    pred2[0, 100:, 4] = 0.0
    out2 = run(jnp.asarray(pred2), 4096)[0]
    assert (out2[:, 4] > 0).sum() == 0
