"""Attribute the eval-protocol vs serving throughput gap (VERDICT r4 #7).

bench.py reports two numbers at b256@640: serving (conf .25, bf16 score
pass, K=512 candidates, iou .45) and eval-protocol (conf .001, f32,
K=4096, iou .65 — config/validation.yaml:4-8). This times the pipeline
CUMULATIVELY per stage for both configs so the delta is attributable:

  fwd            model only
  +decode        + decode_topk candidate selection
  +nms           + nms_candidates (merge off)
  +merge         + box-merge refinement (the full bench body)

Usage (idle host, real chip):
  python scripts/profile_eval_protocol.py | tee runs_chip/eval_gap_r5.jsonl
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np


def timed(fn, args_list, iters=16):
    """Pipelined steady-state median (same scheme as bench.py)."""
    float(fn(*args_list[0])[1])
    pending = None
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        _, checksum = fn(*args_list[i % len(args_list)])
        if pending is not None:
            float(pending)
        pending = checksum
        times.append(time.perf_counter() - t0)
    float(pending)
    return sorted(times[1:])[len(times[1:]) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from yoloseries_tpu.evaluation import decode_topk_yolov5
    from yoloseries_tpu.models import create_model
    from yoloseries_tpu.ops import YOLOV5_ANCHORS
    from yoloseries_tpu.ops.nms import nms_candidates

    batch = 256
    model = create_model("yolov5s", num_class=80, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)), train=False
    )
    anchors = jnp.asarray(YOLOV5_ANCHORS)
    use_pallas = jax.default_backend() not in ("cpu",)

    CONFIGS = {
        "serving": dict(k=512, conf=0.25, cls=0.25, iou=0.45,
                        dtype=jnp.bfloat16),
        "protocol": dict(k=4096, conf=0.001, cls=0.001, iou=0.65,
                         dtype=jnp.float32),
    }

    def make(cfg, stage):
        def body(variables, img_u8):
            img = img_u8.astype(jnp.float32) / 255.0
            preds = model.apply(variables, img, train=False)
            if stage == "fwd":
                return preds, sum(jnp.sum(p.astype(jnp.float32))
                                  for p in preds)
            boxes, scores, cls_ids = decode_topk_yolov5(
                preds, anchors, k=cfg["k"], conf_threshold=cfg["conf"],
                cls_threshold=cfg["cls"], dtype=cfg["dtype"],
            )
            if stage == "decode":
                return boxes, (jnp.sum(boxes.astype(jnp.float32))
                               + jnp.sum(scores.astype(jnp.float32)))
            out = nms_candidates(
                boxes, scores, cls_ids, iou_threshold=cfg["iou"],
                max_keep=300, merge_boxes=(stage == "merge"),
                use_pallas=use_pallas,
            )
            return out, jnp.sum(out)
        return jax.jit(body)

    rng = np.random.default_rng(0)
    imgs = [
        (variables, jnp.asarray(
            rng.integers(0, 255, (batch, 640, 640, 3), dtype=np.uint8)))
        for _ in range(4)
    ]

    for name, cfg in CONFIGS.items():
        prev = None
        for stage in ("fwd", "decode", "nms", "merge"):
            dt = timed(make(cfg, stage), imgs)
            row = {
                "config": name, "stage": stage, "ms": round(dt * 1e3, 2),
                "img_s": round(batch / dt, 1),
                "stage_delta_ms": round((dt - prev) * 1e3, 2) if prev else None,
            }
            prev = dt
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
