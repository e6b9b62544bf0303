"""Device-aug PLANNER throughput benchmark (VERDICT r3 #6).

The device-aug pipeline's host-side cost is planning (rng draws, mosaic
placement, warp matrices, box math — data/device_aug.py plan_sample); the
chip renders pixels at ~6.1k img/s, so the planner rate bounds end-to-end
training throughput on input-bound hosts. This measures:

1. raw single-thread plan rate (plans/s/core),
2. DataLoader plan-mode end-to-end rate at W process workers with the
   async depth-2 producer pipeline (collate of batch N overlaps worker
   planning of batch N+1),

on a synthetic on-disk dataset in the reference folder layout. No TPU
needed (pure host benchmark): run with PALLAS_AXON_POOL_IPS="" to keep the
axon plugin from registering.

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/bench_loader.py [--images 512] [--batch 64] \
      [--workers N] [--seconds 20]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_dataset(root: Path, n: int, size: int, seed: int = 0):
    """Reference folder layout: img/*.jpg + lab/*.txt + names.txt."""
    from PIL import Image

    img_dir, lab_dir = root / "img", root / "lab"
    if img_dir.exists() and len(list(img_dir.glob("*.jpg"))) >= n:
        return img_dir, lab_dir, root / "names.txt"
    img_dir.mkdir(parents=True, exist_ok=True)
    lab_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        h = int(rng.integers(size // 2, size + 1))
        w = int(rng.integers(size // 2, size + 1))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(img_dir / f"{i:05d}.jpg", quality=85)
        lines = []
        for _ in range(int(rng.integers(2, 9))):
            x1, y1 = rng.uniform(0, w - 40), rng.uniform(0, h - 40)
            bw, bh = rng.uniform(20, w - x1), rng.uniform(20, h - y1)
            lines.append(
                f"{int(rng.integers(0, 20))} {x1:.1f} {y1:.1f} "
                f"{min(x1 + bw, w - 1):.1f} {min(y1 + bh, h - 1):.1f}"
            )
        (lab_dir / f"{i:05d}.txt").write_text("\n".join(lines) + "\n")
    (root / "names.txt").write_text(
        "\n".join(f"{i} c{i}" for i in range(20)) + "\n"
    )
    return img_dir, lab_dir, root / "names.txt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, default=os.cpu_count())
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--root", default="/tmp/bench_loader_ds")
    args = ap.parse_args()

    from yoloseries_tpu.data.augment import AugmentConfig
    from yoloseries_tpu.data.dataset import DetectionDataset
    from yoloseries_tpu.data.device_aug import plan_sample
    from yoloseries_tpu.data.loader import DataLoader

    img_dir, lab_dir, names = make_dataset(
        Path(args.root), args.images, args.size
    )
    aug = AugmentConfig(
        input_size=(args.size, args.size), mosaic_p=1.0, mixup_p=0.3,
        perspective_p=1.0, hsv_p=1.0, fliplr_p=0.3, cutout_p=0.3,
    )
    ds = DetectionDataset(img_dir, lab_dir, names,
                          input_size=(args.size, args.size), aug=aug,
                          cache_images=True)

    # ---- 1. raw single-thread planner rate (with and without pixel tiles)
    for with_pixels, label in ((True, "tiles"), (False, "device_cache")):
        n, t0 = 0, time.perf_counter()
        while time.perf_counter() - t0 < max(args.seconds / 4, 3.0):
            rng = np.random.default_rng((7, n))
            plan_sample(ds, n % len(ds), rng, with_pixels=with_pixels)
            n += 1
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"planner_single_thread_{label}",
            "value": round(n / dt, 1), "unit": "plans/s/core",
        }))

    # ---- 2. DataLoader end-to-end plan-mode rate (process pool + async
    # depth-2 producer pipeline), host side only — no renderer, so this is
    # the pure input-pipeline bound a chip consumer would see
    for cache in (True, False):
        loader = DataLoader(
            ds, batch_size=args.batch, workers=args.workers,
            device_aug=True, device_cache=cache, prefetch=4,
        )
        try:
            it = iter(loader)
            next(it)  # warm the pool (fork + first cache touch)
            n, t0 = 0, time.perf_counter()
            while time.perf_counter() - t0 < args.seconds:
                next(it)
                n += 1
            dt = time.perf_counter() - t0
        finally:
            loader.stop()
        print(json.dumps({
            "metric": ("loader_plans_device_cache" if cache
                       else "loader_plans_tiles"),
            "value": round(n * args.batch / dt, 1), "unit": "plans/s",
            "workers": args.workers, "batch": args.batch,
        }))


if __name__ == "__main__":
    main()
