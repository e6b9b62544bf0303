"""Generate a synthetic detection dataset in the reference's folder layout
(README.md:25-50: img_dir/*.jpg + lab_dir/*.txt "cls xmin ymin xmax ymax"
absolute px + names.txt) for the at-scale dress rehearsal: same commands as
a COCO run, different --img-dir.

Classes are visually learnable: each class is a (shape, hue) pair drawn on
cluttered backgrounds, so a real training run shows rising mAP with full
augmentation on.

Usage:
  python scripts/make_synthetic_dataset.py --root /tmp/synth2k \
      [--train 2000] [--val 250] [--classes 20] [--seed 0]
"""

import argparse
import colorsys
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw


def class_palette(n):
    """n visually distinct (shape, RGB) pairs."""
    shapes = ["rect", "ellipse", "triangle", "cross"]
    out = []
    for i in range(n):
        h = (i * 0.61803) % 1.0  # golden-ratio hue walk
        r, g, b = colorsys.hsv_to_rgb(h, 0.85, 0.95)
        out.append((shapes[i % len(shapes)], (int(r * 255), int(g * 255), int(b * 255))))
    return out


def draw_object(draw, shape, color, x1, y1, x2, y2):
    if shape == "rect":
        draw.rectangle([x1, y1, x2, y2], fill=color)
    elif shape == "ellipse":
        draw.ellipse([x1, y1, x2, y2], fill=color)
    elif shape == "triangle":
        draw.polygon([((x1 + x2) // 2, y1), (x1, y2), (x2, y2)], fill=color)
    else:  # cross
        w3 = max((x2 - x1) // 3, 1)
        h3 = max((y2 - y1) // 3, 1)
        draw.rectangle([x1 + w3, y1, x2 - w3, y2], fill=color)
        draw.rectangle([x1, y1 + h3, x2, y2 - h3], fill=color)


def make_image(rng, palette, nc, min_obj=1, max_obj=8):
    w = int(rng.integers(480, 801))
    h = int(rng.integers(480, 801))
    # cluttered background: random low-saturation blocks
    bg = rng.integers(40, 180, (6, 6, 3), dtype=np.uint8)
    bg = np.kron(bg, np.ones((h // 6 + 1, w // 6 + 1, 1), np.uint8))[:h, :w]
    img = Image.fromarray(bg)
    draw = ImageDraw.Draw(img)
    boxes = []
    for _ in range(int(rng.integers(min_obj, max_obj + 1))):
        cls = int(rng.integers(0, nc))
        ow = int(rng.integers(40, min(w // 2, 260)))
        oh = int(rng.integers(40, min(h // 2, 260)))
        x1 = int(rng.integers(0, w - ow))
        y1 = int(rng.integers(0, h - oh))
        shape, color = palette[cls]
        # per-instance slight color jitter so the task isn't trivial
        color = tuple(int(np.clip(c + rng.integers(-25, 26), 0, 255)) for c in color)
        draw_object(draw, shape, color, x1, y1, x1 + ow, y1 + oh)
        boxes.append((cls, x1, y1, x1 + ow, y1 + oh))
    return img, boxes


def write_split(root, split, n, palette, nc, seed):
    img_dir = root / split / "images"
    lab_dir = root / split / "labels"
    img_dir.mkdir(parents=True, exist_ok=True)
    lab_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        img, boxes = make_image(rng, palette, nc)
        img.save(img_dir / f"{i:06d}.jpg", quality=90)
        lines = [f"{c} {x1} {y1} {x2} {y2}" for c, x1, y1, x2, y2 in boxes]
        (lab_dir / f"{i:06d}.txt").write_text("\n".join(lines) + "\n")
    return img_dir, lab_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--train", type=int, default=2000)
    ap.add_argument("--val", type=int, default=250)
    ap.add_argument("--classes", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    root = Path(args.root)
    palette = class_palette(args.classes)
    write_split(root, "train", args.train, palette, args.classes, args.seed)
    write_split(root, "val", args.val, palette, args.classes, args.seed + 1)
    names = "\n".join(
        f"{i} {shape}_{rgb[0]:02x}{rgb[1]:02x}{rgb[2]:02x}"
        for i, (shape, rgb) in enumerate(palette)
    )
    (root / "names.txt").write_text(names + "\n")
    print(f"wrote {args.train} train / {args.val} val images, "
          f"{args.classes} classes under {root}")


if __name__ == "__main__":
    main()
