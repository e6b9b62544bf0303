"""Decompose the yolov5s train-step walltime on the real chip (VERDICT
round-2 item 2: "fwd 65 ms vs 197 ms full step @128 is unexplained").

Times each stage as its own jitted function with a host-synced scalar
checksum per call (block_until_ready lies over the axon relay — see
.claude/skills/verify/SKILL.md):

  fwd        forward pass only (train=True, mutable BN)
  loss       family loss (assignment + components) on fixed preds
  fwd+loss   value only, no grad
  grad       jax.grad of fwd+loss
  step       full train step (grad + SGD update + EMA)

Usage:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_train.py
        [--batch 128] [--size 640] [--trace /tmp/jax-trace]
"""

import argparse
import json
import os
import time

import numpy as np

# persistent compile cache: repeat profile runs skip the ~15 min of
# compiles over the tunneled chip (same setup as bench.py)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


SYNC_EACH = False


def sync_median(fn, args_list, warmup=1, iters=8):
    """Median walltime of fn over iters calls. Default is the bench.py
    pipelined scheme: submit call i, then float() call i-1's scalar — calls
    serialize on the device, so steady-state wall time is device time and
    the ~30 ms axon relay round-trip overlaps dispatch instead of being
    paid per call. --sync-each restores the old float()-every-call timing
    (per-call latency incl. relay; runs_chip/levers_r4.jsonl used this)."""
    if SYNC_EACH:
        for i in range(warmup):
            float(fn(*args_list[i % len(args_list)]))
        times = []
        for i in range(iters):
            t0 = time.perf_counter()
            float(fn(*args_list[i % len(args_list)]))
            times.append(time.perf_counter() - t0)
        return sorted(times)[len(times) // 2]
    for i in range(warmup):
        float(fn(*args_list[i % len(args_list)]))
    pending, times = None, []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args_list[i % len(args_list)])
        if pending is not None:
            float(pending)
        pending = out
        times.append(time.perf_counter() - t0)
    float(pending)
    return sorted(times[1:])[len(times[1:]) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--nc", type=int, default=80)
    ap.add_argument("--accumulate", type=int, default=1)
    ap.add_argument("--model", default="yolov5s",
                    help="any v5-family name (yolov5s/m/l/...); m/l act as "
                         "width-vs-MFU diagnostics for the narrow-channel "
                         "hypothesis (same loss, wider convs)")
    ap.add_argument("--donate", action="store_true",
                    help="donate the train state into the step (halves "
                         "param+opt HBM residency; frees headroom for "
                         "bigger batches)")
    ap.add_argument("--s2d-stem", action="store_true",
                    help="space-to-depth stem reparam (equivalent arithmetic)")
    ap.add_argument("--remat", action="store_true",
                    help="per-CSP-stage activation rematerialization")
    ap.add_argument("--stages", default="fwd,loss,fwd_loss,grad,full_step",
                    help="comma list of stages to time (full_step is cheapest "
                         "to compile for flag sweeps)")
    ap.add_argument("--trace", default=None,
                    help="directory for a jax.profiler trace of 3 full steps")
    ap.add_argument("--gather-mode", default=None, choices=["flat", "cells"],
                    help="loss candidate-gather lowering A/B (default: "
                         "YOLOv5LossConfig default)")
    ap.add_argument("--sync-each", action="store_true",
                    help="float() every call instead of pipelining "
                         "(adds the ~30 ms relay round-trip per call)")
    ap.add_argument("--xla-opt", action="append", default=[],
                    help="key=value TPU compiler option, passed per-compile "
                         "via lowered.compile(compiler_options=...). "
                         "XLA_FLAGS cannot carry TPU flags here: the host "
                         "jaxlib's parse_flags_from_env is CPU-only and "
                         "aborts on unknown --xla_tpu_* flags (the compile "
                         "itself happens remotely). full_step stage only.")
    args = ap.parse_args()
    global SYNC_EACH
    SYNC_EACH = args.sync_each

    import jax
    import jax.numpy as jnp

    from yoloseries_tpu.losses.yolov5 import YOLOv5LossConfig, yolov5_loss
    from yoloseries_tpu.models import create_model
    from yoloseries_tpu.ops import YOLOV5_ANCHORS
    from yoloseries_tpu.train import (
        OptimizerConfig, build_optimizer, create_train_state, make_train_step,
    )
    from yoloseries_tpu.utils.summary import summarize_model

    if not args.model.startswith("yolov5"):
        raise SystemExit(
            f"--model {args.model}: this profiler hardwires the v5 loss "
            "(YOLOv5LossConfig/YOLOV5_ANCHORS); only yolov5* models measure "
            "correctly here"
        )
    B, S, nc = args.batch, args.size, args.nc
    model = create_model(args.model, num_class=nc, dtype=jnp.bfloat16,
                         s2d_stem=args.s2d_stem, remat=args.remat)
    gflops = summarize_model(model, (1, S, S, 3))["gflops"]
    loss_kw = {}
    if args.gather_mode:
        loss_kw["gather_mode"] = args.gather_mode
    loss_cfg = YOLOv5LossConfig(num_class=nc, input_size=(S, S), **loss_kw)
    anchors = jnp.asarray(YOLOV5_ANCHORS)

    cfg = OptimizerConfig(batch_size=B, total_epochs=2, steps_per_epoch=4,
                          do_warmup=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, S, S, 3)), train=False)
    tx = build_optimizer(cfg, variables["params"])
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (1, S, S, 3))

    rng = np.random.default_rng(1)
    imgs, anns = [], []
    for _ in range(2):
        imgs.append(jnp.asarray(
            rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8)))
        ann = np.full((B, 32, 6), -1, np.float32)
        for i in range(B):
            ann[i, 0] = [100, 100, 400, 400, i % nc, i]
        anns.append(jnp.asarray(ann))

    params, stats, balances = state.params, state.batch_stats, state.balances
    stages = set(args.stages.split(","))

    # ---- fwd only
    @jax.jit
    def fwd(p, st, img_u8):
        img = img_u8.astype(jnp.bfloat16) / jnp.asarray(255.0, jnp.bfloat16)
        preds, _ = model.apply({"params": p, "batch_stats": st}, img,
                               train=True, mutable=["batch_stats"])
        return sum(jnp.sum(x.astype(jnp.float32)) for x in preds)

    t_fwd = (sync_median(fwd, [(params, stats, im) for im in imgs])
             if "fwd" in stages else None)

    # ---- loss only (on materialized preds)
    def run_model(img_u8):
        img = img_u8.astype(jnp.bfloat16) / jnp.asarray(255.0, jnp.bfloat16)
        preds, _ = model.apply({"params": params, "batch_stats": stats}, img,
                               train=True, mutable=["batch_stats"])
        return preds

    if "loss" in stages:
        preds_fixed = [jax.tree.map(jnp.copy, run_model(im)) for im in imgs]

        @jax.jit
        def loss_only(preds, ann):
            d, _ = yolov5_loss(preds, ann, anchors, balances, loss_cfg)
            return d["tot_loss"]

        t_loss = sync_median(loss_only,
                             [(p, a) for p, a in zip(preds_fixed, anns)])
    else:
        t_loss = None

    # ---- fwd + loss (no grad)
    @jax.jit
    def fwd_loss(p, st, img_u8, ann):
        img = img_u8.astype(jnp.bfloat16) / jnp.asarray(255.0, jnp.bfloat16)
        preds, _ = model.apply({"params": p, "batch_stats": st}, img,
                               train=True, mutable=["batch_stats"])
        d, _ = yolov5_loss(preds, ann, anchors, balances, loss_cfg)
        return d["tot_loss"]

    t_fwdloss = (sync_median(
        fwd_loss, [(params, stats, im, an) for im, an in zip(imgs, anns)])
        if "fwd_loss" in stages else None)

    # ---- grad of fwd+loss
    @jax.jit
    def grad_sum(p, st, img_u8, ann):
        g = jax.grad(fwd_loss)(p, st, img_u8, ann)
        return jax.tree.reduce(
            jnp.add, jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), g))

    t_grad = (sync_median(
        grad_sum, [(params, stats, im, an) for im, an in zip(imgs, anns)])
        if "grad" in stages else None)

    # ---- full step
    step = make_train_step(loss_cfg, YOLOV5_ANCHORS, accumulate=args.accumulate,
                           compute_dtype=jnp.bfloat16, donate=args.donate)
    batches = [{"img": im, "ann": an} for im, an in zip(imgs, anns)]

    if args.xla_opt:
        opts = dict(kv.split("=", 1) for kv in args.xla_opt)
        step = step.lower(state, batches[0]).compile(compiler_options=opts)
        print(f"# compiled with compiler_options={opts}")

    def full(b):
        nonlocal state
        state, m = step(state, b)
        return m["tot_loss"]

    t_step = (sync_median(full, [(b,) for b in batches])
              if "full_step" in stages else None)

    if args.trace:
        import jax.profiler as prof
        with prof.trace(args.trace):
            for i in range(3):
                state, m = step(state, batches[i % 2])
            float(m["tot_loss"])
        print(f"# trace written to {args.trace}")

    peak = 197e12
    def line(name, t):
        if t is None:
            return
        img_s = B / t
        print(json.dumps({
            "stage": name, "ms": round(t * 1e3, 2),
            "img_s": round(img_s, 1),
            "mfu_fwd_flops": round(gflops * 1e9 * img_s / peak, 4),
        }))

    print(f"# {args.model} @{S} batch {B} bf16, fwd {gflops:.1f} GFLOPs/img")
    line("fwd", t_fwd)
    line("loss", t_loss)
    line("fwd_loss", t_fwdloss)
    line("grad", t_grad)
    line("full_step", t_step)
    if t_step is not None:
        print(json.dumps({
            "stage": "mfu_full_step_3x",
            "value": round(3 * gflops * 1e9 * (B / t_step) / peak, 4),
        }))


if __name__ == "__main__":
    main()
