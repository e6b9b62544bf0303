"""Measure the device-side augmentation split (data/device_aug.py).

Three numbers tell the story on an augmentation-bound host:
  host_aug_img_s     full cv2 pipeline per core (the old ceiling)
  plan_img_s         planner-only per core (the new host cost)
  render_ms_b{B}     device render time per batch (the new device cost)

Uses the rehearsal dataset (scripts/make_synthetic_dataset.py) when
present, else generates a small one.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_device_aug.py
       [--root /tmp/synth2k] [--batch 64] [--size 640] [--iters 40]
"""

import argparse
import json
import os
import time
from functools import partial

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth2k")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    if not os.path.isdir(os.path.join(args.root, "train", "images")):
        import subprocess
        import sys

        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__),
                          "make_synthetic_dataset.py"),
             "--root", args.root, "--n-train", "256", "--n-val", "8"],
            check=True,
        )

    from yoloseries_tpu.data import DetectionDataset
    from yoloseries_tpu.data.dataset import load_names  # noqa: F401
    from yoloseries_tpu.data.device_aug import plan_sample
    from yoloseries_tpu.data.loader import collate_plan_batch

    s = args.size
    ds = DetectionDataset(
        os.path.join(args.root, "train", "images"),
        os.path.join(args.root, "train", "labels"),
        os.path.join(args.root, "names.txt"),
        input_size=(s, s),
        cache_images=True,
    )

    # --- host full-aug rate (one core, the reference pipeline)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for i in range(args.iters):
        ds.get(i % len(ds), np.random.default_rng((0, i)))
    host_rate = args.iters / (time.perf_counter() - t0)
    print(json.dumps({"metric": "host_aug_img_s_per_core",
                      "value": round(host_rate, 2)}))

    # --- planner rate (one core, the device-aug host cost)
    t0 = time.perf_counter()
    plans = []
    for i in range(args.iters):
        plans.append(plan_sample(ds, i % len(ds), np.random.default_rng((0, i))))
    plan_rate = args.iters / (time.perf_counter() - t0)
    print(json.dumps({"metric": "plan_img_s_per_core",
                      "value": round(plan_rate, 2),
                      "speedup_vs_host_aug": round(plan_rate / host_rate, 2)}))

    # --- pixel-free planner rate (device_cache mode: no tile memcpy)
    t0 = time.perf_counter()
    for i in range(args.iters):
        plan_sample(ds, i % len(ds), np.random.default_rng((0, i)),
                    with_pixels=False)
    rate = args.iters / (time.perf_counter() - t0)
    print(json.dumps({"metric": "plan_nopix_img_s_per_core",
                      "value": round(rate, 2),
                      "speedup_vs_host_aug": round(rate / host_rate, 2)}))

    # --- device render time (amortized over R chained calls per sync)
    import jax
    import jax.numpy as jnp

    from yoloseries_tpu.data.device_aug import render_batch

    b = args.batch
    batch = collate_plan_batch(
        [plans[i % len(plans)] for i in range(b)], (s, s), max_labels=64
    )
    tiles = jax.device_put(batch["tiles"])
    plan = {k: jax.device_put(v) for k, v in batch["plan"].items()}

    R = 8

    for method in ("separable", "gather"):
        # tiles/plan MUST be jit arguments: closure capture would bake the
        # (B,8,s,s,3) tile buffer into the program as a constant (hundreds
        # of MB through the relay's compile endpoint)
        @partial(jax.jit, static_argnames=("m",))
        def chain(c, tiles, plan, m):
            for _ in range(R):
                out = render_batch(tiles, plan, out_hw=(s, s),
                                   tile_hw=(s, s), method=m)
                c = c + jnp.sum(out.astype(jnp.float32)[0, 0, 0]) + 1.0
            return c

        float(chain(jnp.zeros(()), tiles, plan, method))  # compile + warm
        times = []
        for i in range(5):
            t0 = time.perf_counter()
            float(chain(jnp.float32(i), tiles, plan, method))
            times.append(time.perf_counter() - t0)
        tot = sorted(times)[2]
        per_ms = tot / R * 1e3
        print(json.dumps({
            "metric": f"render_ms_b{b}_{s}px_{method}",
            "value": round(per_ms, 2),
            "render_img_s": round(b / (per_ms / 1e3), 1),
        }))


if __name__ == "__main__":
    main()
