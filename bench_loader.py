"""Host input-pipeline throughput: sustained images/sec out of the threaded
DataLoader with the full train augmentation stack (mosaic + HSV + flips +
perspective) against the memmap image cache (VERDICT r1 item 5).

Host-only — runs anywhere. Prints one JSON line:
  {"metric": "loader_train_aug", "value": N, "unit": "img/s/host", ...}

Context: the serving bench (bench.py) moves ~2,100 img/s/chip at 640px; the
host loader must sustain at least that per chip to keep training/eval input-
bound-free, and N x that on an N-chip host.
"""

import json
import shutil
import tempfile
import time
from pathlib import Path

import numpy as np


def build_dataset(root: Path, n_images: int = 64, hw=(480, 640)):
    from PIL import Image

    img_dir, lab_dir = root / "img", root / "lab"
    img_dir.mkdir(parents=True), lab_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n_images):
        arr = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i:04d}.jpg", quality=85)
        n = rng.integers(1, 12)
        xy = rng.uniform(0, min(hw) - 80, (n, 2))
        wh = rng.uniform(16, 80, (n, 2))
        lines = [
            f"{rng.integers(0, 20)} {x:.1f} {y:.1f} {x + w:.1f} {y + h:.1f}"
            for (x, y), (w, h) in zip(xy, wh)
        ]
        (lab_dir / f"im{i:04d}.txt").write_text("\n".join(lines) + "\n")
    (root / "names.txt").write_text("\n".join(f"{i} c{i}" for i in range(20)))
    return img_dir, lab_dir, root / "names.txt"


def main(batch_size=64, workers=16, warm_batches=4, timed_batches=24):
    from yoloseries_tpu.data.dataset import DetectionDataset
    from yoloseries_tpu.data.loader import DataLoader

    root = Path(tempfile.mkdtemp(prefix="bench_loader_"))
    try:
        img_dir, lab_dir, names = build_dataset(root)
        ds = DetectionDataset(
            img_dir, lab_dir, names, input_size=(640, 640),
            enable_aug=True, cache_images=True, cache_dir=root / "cache",
        )
        loader = DataLoader(
            ds, batch_size=batch_size, max_labels=120, workers=workers, seed=1,
            use_processes=True,  # measure the production (multi-core) path
        )
        try:
            for _ in range(warm_batches):
                next(loader)
            t0 = time.perf_counter()
            for _ in range(timed_batches):
                b = next(loader)
            dt = time.perf_counter() - t0
        finally:
            loader.stop()
        img_s = timed_batches * batch_size / dt
        import os

        print(json.dumps({
            "metric": "loader_train_aug",
            "value": round(img_s, 1),
            "unit": "img/s/host",
            "batch_size": batch_size,
            "workers": workers,
            "cores": os.cpu_count(),
            "dropped_boxes": loader.dropped_boxes,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
