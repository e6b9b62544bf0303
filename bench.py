"""Benchmark: YOLOv5s 640px end-to-end batched inference on one TPU chip.

Measures images/sec for the full serving path — uint8 input, on-device
normalize, model forward (bf16), decode, class-aware NMS (Pallas kernel)
with supporter-count merge — and prints ONE JSON line.

Methodology notes:
* this runtime's block_until_ready can return before remote execution
  finishes, so each timed call is synced by pulling a scalar reduction of
  the output to host,
* distinct input batches per iteration defeat any call-level caching.

Baseline: the driver's stretch target of 5000 img/s on a v5e-8 => 625
img/s/chip (BASELINE.md); the reference itself publishes no numbers (its
warm single-image detect latency is 0.20 s/img ~= 5 img/s on a Quadro
P5000, README.md:91-94).
"""

import json
import os
import socket
import sys
import time

import numpy as np

# persistent XLA compile cache: first-ever run pays the compiles (~10 min
# over the tunneled chip), every later run starts in seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def _preflight_relay():
    """Fail fast if the axon loopback relay is dead.

    The axon plugin registers from sitecustomize at interpreter start and
    blocks indefinitely trying to reach the relay — if the relay process is
    gone (observed mid-round-3), `import jax` hangs forever. This module is
    imported BEFORE jax, so probe the relay's TCP ports here and exit with
    a parseable error line instead of hanging the driver."""
    if os.environ.get("PALLAS_AXON_POOL_IPS") in (None, ""):
        return  # CPU / non-axon run
    for port in (8082, 8083, 8087, 8092):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2):
                return  # relay alive
        except OSError:
            continue
    print(json.dumps({
        "metric": "yolov5s_640_e2e_infer",
        "value": 0.0,
        "unit": "img/s/chip",
        "error": "axon relay unreachable (all loopback ports closed); "
                 "TPU tunnel is down — bench skipped instead of hanging",
    }))
    sys.exit(2)


def main():
    _preflight_relay()
    import jax
    import jax.numpy as jnp

    from yoloseries_tpu.evaluation import decode_topk_yolov5
    from yoloseries_tpu.models import create_model
    from yoloseries_tpu.ops import YOLOV5_ANCHORS
    from yoloseries_tpu.ops.nms import nms_candidates

    batch = 256
    # BENCH_INFER_S2D=1: space-to-depth stem (exact reparam, nn/deploy.py)
    model = create_model(
        "yolov5s", num_class=80, dtype=jnp.bfloat16,
        s2d_stem=os.environ.get("BENCH_INFER_S2D") == "1",
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)), train=False
    )
    anchors = jnp.asarray(YOLOV5_ANCHORS)
    use_pallas = jax.default_backend() not in ("cpu",)

    def e2e_body(variables, img_u8):
        img = img_u8.astype(jnp.float32) / 255.0
        preds = model.apply(variables, img, train=False)
        # serving config: fused top-k candidate selection straight off the
        # raw maps (bf16 score pass, no dense decoded tensor — saves ~3 GB
        # of HBM traffic at batch 256) + 512 NMS candidates at conf 0.25
        boxes, scores, cls_ids = decode_topk_yolov5(
            preds, anchors, k=512, conf_threshold=0.25, cls_threshold=0.25,
            dtype=jnp.bfloat16,
        )
        out = nms_candidates(
            boxes, scores, cls_ids,
            iou_threshold=0.45,
            max_keep=300,
            merge_boxes=True,
            use_pallas=use_pallas,
        )
        # scalar checksum: forces full materialization at sync time
        return out, jnp.sum(out)

    e2e = jax.jit(e2e_body)

    @jax.jit
    def e2e_protocol(variables, img_u8):
        """The mAP-validation configuration (config/validation.yaml:4-8):
        conf .001 / iou .65 / f32 / 4096 candidates — what evaluate()
        actually runs (the Evaluator's fused single-label path), reported
        alongside the serving number (VERDICT r1)."""
        img = img_u8.astype(jnp.float32) / 255.0
        preds = model.apply(variables, img, train=False)
        boxes, scores, cls_ids = decode_topk_yolov5(
            preds, anchors, k=4096, conf_threshold=0.001, cls_threshold=0.001,
        )
        out = nms_candidates(
            boxes, scores, cls_ids,
            iou_threshold=0.65,
            max_keep=300,
            merge_boxes=True,
            use_pallas=use_pallas,
        )
        return out, jnp.sum(out)

    def timed(fn, args_list, iters=16):
        """Sustained pipelined throughput: two batches in flight, each
        iteration syncs the PREVIOUS call's checksum after submitting the
        next. Overlaps the host->relay dispatch latency (~30 ms on the
        tunneled chip, measured via a (8,)-sum floor probe) with device
        compute, like any serving frontend would. Every checksum is still
        pulled (one step delayed), so all work provably executes."""
        float(fn(*args_list[0])[1])  # warmup + compile
        pending = None
        times = []
        for i in range(iters):
            t0 = time.perf_counter()
            _, checksum = fn(*args_list[i % len(args_list)])
            if pending is not None:
                float(pending)  # sync call i-1 while call i runs
            pending = checksum
            times.append(time.perf_counter() - t0)
        float(pending)
        # median of steady-state (skip the first, unpipelined iteration)
        return sorted(times[1:])[len(times[1:]) // 2]

    rng = np.random.default_rng(0)
    imgs = [
        (variables, jnp.asarray(
            rng.integers(0, 255, (batch, 640, 640, 3), dtype=np.uint8)))
        for _ in range(4)
    ]

    dt_protocol = timed(e2e_protocol, imgs)
    protocol_img_s = batch / dt_protocol

    dt = timed(e2e, imgs)
    img_per_s = batch / dt

    # ---- p50 small-batch latency sweep (BASELINE.md: "measured and
    # reported"): serving config, batches 1/8/32.
    #
    # On-chip latency is measured DIRECTLY with a K-chained device loop —
    # one dispatch runs K sequential end-to-end iterations (each data-
    # dependent on the previous checksum so XLA cannot hoist the body),
    # so the ~30 ms tunnel round trip amortizes to noise and no relay-floor
    # subtraction is needed (the r3 floor probe varied 26-35 ms across runs
    # and once exceeded the measurement). The per-call synced p50 is kept
    # as the separate tunnel-inclusive number.
    from functools import partial

    @partial(jax.jit, static_argnames=("k_iters",))
    def e2e_chain(variables, img_u8, k_iters):
        def body(i, acc):
            # data-dependence on the carry: provably-live per iteration,
            # the uint8 perturbation is 0/1 on one LSB of the image
            img = img_u8 + (acc.astype(jnp.int32) % 2).astype(jnp.uint8)
            _, checksum = e2e_body(variables, img)
            return acc + checksum
        return jax.lax.fori_loop(0, k_iters, body, jnp.float32(0.0))

    k_chain = 50
    lat_sweep = {}
    for lb in (1, 8, 32):
        img_lb = jnp.asarray(
            rng.integers(0, 255, (lb, 640, 640, 3), dtype=np.uint8))
        float(e2e_chain(variables, img_lb, k_chain))  # compile + warm
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(e2e_chain(variables, img_lb, k_chain))
            reps.append((time.perf_counter() - t0) / k_chain)
        onchip_ms = sorted(reps)[len(reps) // 2] * 1e3

        # tunnel-inclusive per-call p50 (what a single remote call costs)
        float(e2e(variables, img_lb)[1])
        lat = []
        for _ in range(12):
            t0 = time.perf_counter()
            float(e2e(variables, img_lb)[1])
            lat.append(time.perf_counter() - t0)
        lat_sweep[lb] = (onchip_ms, sorted(lat)[len(lat) // 2] * 1e3)

    # ---- training step: fwd+assign+loss+bwd+optimizer, bf16, batch 128
    train_img_s, mfu = _bench_train_step()

    baseline = 625.0  # img/s/chip (5000 img/s v5e-8 stretch / 8 chips)
    print(json.dumps({
        "metric": "yolov5s_640_eval_protocol_infer",
        "value": round(protocol_img_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(protocol_img_s / baseline, 4),
    }))
    for lb, (onchip_ms, sync_ms) in lat_sweep.items():
        print(json.dumps({
            "metric": f"yolov5s_640_p50_latency_b{lb}",
            "value": round(onchip_ms, 2),
            "unit": "ms",
            "method": f"{k_chain}-chained on-device loop",
            "tunnel_inclusive_ms": round(sync_ms, 2),
        }))
    print(json.dumps({
        "metric": "yolov5s_640_train_step",
        "value": round(train_img_s, 2),
        "unit": "img/s/chip",
        "mfu": round(mfu, 4),
    }))
    # primary (driver-parsed) line LAST: the serving configuration
    print(json.dumps({
        "metric": "yolov5s_640_e2e_infer",
        "value": round(img_per_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / baseline, 4),
    }))


def _bench_train_step(batch=None, size=640, nc=80):
    """One fused train step (grad + sgd update + EMA) throughput and an MFU
    estimate: 3x forward GFLOPs per image (fwd + ~2x bwd) over the v5e chip's
    197 TFLOP/s bf16 peak.

    Env knobs for the perf variants (defaults match the certified config):
    BENCH_TRAIN_BATCH, BENCH_TRAIN_S2D=1, BENCH_TRAIN_REMAT=1."""
    import jax
    import jax.numpy as jnp

    from yoloseries_tpu.losses.yolov5 import YOLOv5LossConfig
    from yoloseries_tpu.models import create_model
    from yoloseries_tpu.ops import YOLOV5_ANCHORS
    from yoloseries_tpu.train import (
        OptimizerConfig, build_optimizer, create_train_state, make_train_step,
    )
    from yoloseries_tpu.utils.summary import summarize_model

    batch = batch or int(os.environ.get("BENCH_TRAIN_BATCH", 128))
    model = create_model(
        "yolov5s", num_class=nc, dtype=jnp.bfloat16,
        s2d_stem=os.environ.get("BENCH_TRAIN_S2D") == "1",
        remat=os.environ.get("BENCH_TRAIN_REMAT") == "1",
    )
    gflops = summarize_model(model, (1, size, size, 3))["gflops"]

    cfg = OptimizerConfig(batch_size=batch, total_epochs=2, steps_per_epoch=4,
                          do_warmup=False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False
    )
    tx = build_optimizer(cfg, variables["params"])
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (1, size, size, 3))
    loss_cfg = YOLOv5LossConfig(num_class=nc, input_size=(size, size))
    step = make_train_step(loss_cfg, YOLOV5_ANCHORS, accumulate=1,
                           compute_dtype=jnp.bfloat16, donate=False)

    rng = np.random.default_rng(1)
    batches = []
    for _ in range(2):
        img = rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
        ann = np.full((batch, 32, 6), -1, np.float32)
        for i in range(batch):
            ann[i, 0] = [100, 100, 400, 400, i % nc, i]
        batches.append({"img": jnp.asarray(img), "ann": jnp.asarray(ann)})

    state, m = step(state, batches[0])  # compile
    float(m["tot_loss"])
    # pipelined: sync the previous step's loss after submitting the next —
    # steps already serialize on the device through the state dependency,
    # this only overlaps the host->relay dispatch latency with compute
    pending = None
    times = []
    for i in range(8):
        t0 = time.perf_counter()
        state, m = step(state, batches[i % 2])
        if pending is not None:
            float(pending)
        pending = m["tot_loss"]
        times.append(time.perf_counter() - t0)
    float(pending)
    dt = sorted(times[1:])[len(times[1:]) // 2]
    img_s = batch / dt
    peak_flops = 197e12  # TPU v5e bf16 peak
    mfu = (3.0 * gflops * 1e9 * img_s) / peak_flops
    return img_s, mfu


if __name__ == "__main__":
    main()
