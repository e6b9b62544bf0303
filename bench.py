"""Benchmark: YOLOv5s 640px end-to-end batched inference on one TPU chip.

Measures images/sec for the full serving path — uint8 input, on-device
normalize, model forward (bf16), decode, class-aware NMS with merge — and
prints ONE JSON line. Baseline: the driver's stretch target of 5000 img/s on
a v5e-8 => 625 img/s/chip (BASELINE.md); the reference itself publishes no
numbers (its warm single-image detect latency is 0.20 s/img ≈ 5 img/s on a
Quadro P5000, README.md:91-94).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yoloseries_tpu.evaluation import EvalConfig, Evaluator, decode_yolov5
    from yoloseries_tpu.models import create_model
    from yoloseries_tpu.ops import YOLOV5_ANCHORS

    batch = 32
    model = create_model("yolov5s", num_class=80, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)), train=False
    )
    anchors = jnp.asarray(YOLOV5_ANCHORS)
    cfg = EvalConfig(
        conf_threshold=0.25,
        cls_threshold=0.25,
        iou_threshold=0.45,
        num_candidates=1024,
        max_keep=300,
        merge_boxes=True,
    )
    ev = Evaluator(
        model.apply, lambda p: decode_yolov5(p, anchors), cfg
    )

    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.integers(0, 255, (batch, 640, 640, 3), dtype=np.uint8)
    )

    # warmup + compile
    ev(variables, img).block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = ev(variables, img)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    img_per_s = batch * iters / dt
    baseline = 625.0  # img/s/chip (5000 img/s v5e-8 stretch / 8 chips)
    print(
        json.dumps(
            {
                "metric": "yolov5s_640_e2e_infer",
                "value": round(img_per_s, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_s / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
