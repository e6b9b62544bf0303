"""Distributional A/B of the TRAINING DATA STREAM: executed reference
pipeline vs ours, same dataset, aug enabled.

The loss/trajectory oracles certify the train step given identical
batches; the converged-mAP gap (runs_chip/parity_*.json) therefore points
at the data stream. RNG draw orders differ by design between the two
pipelines, so samples can't be compared 1:1 — this compares
DISTRIBUTIONS over N batches instead: boxes/sample, box geometry,
class balance, pixel statistics.

Usage:
  python scripts/diag_aug_stream.py --root /tmp/parity_ds --batches 24
"""

import argparse
import json
import sys
import types
from pathlib import Path

import numpy as np
import yaml

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def summarize(name, counts, ws, hs, areas, pix_mean, pix_std, extra=None):
    q = lambda a, p: float(np.quantile(np.asarray(a, np.float64), p)) if len(a) else -1.0
    out = {
        "side": name,
        "boxes_per_sample": round(float(np.mean(counts)), 2),
        "boxes_per_sample_std": round(float(np.std(counts)), 2),
        "frac_empty": round(float(np.mean(np.asarray(counts) == 0)), 4),
        "w_q50": round(q(ws, 0.5), 1), "w_q90": round(q(ws, 0.9), 1),
        "h_q50": round(q(hs, 0.5), 1), "h_q90": round(q(hs, 0.9), 1),
        "area_q50": round(q(areas, 0.5), 1),
        "tiny_frac(<8px)": round(float(np.mean((np.asarray(ws) < 8) | (np.asarray(hs) < 8))), 4) if len(ws) else -1,
        "pix_mean": round(float(np.mean(pix_mean)), 4),
        "pix_std": round(float(np.mean(pix_std)), 4),
    }
    if extra:
        out.update(extra)
    print(json.dumps(out))
    return out


def flat_hyp(cfg_path):
    raw = yaml.safe_load(Path(cfg_path).read_text())
    hyp = {}
    for sec in raw.values():
        hyp.update(sec)
    return hyp


def ref_side(root, hyp, batches, seed=7):
    from ref_loader import load_reference_training

    mod = load_reference_training()
    root = Path(root)
    nc = sum(1 for ln in (root / "names.txt").read_text().splitlines()
             if ln.strip())
    s = types.SimpleNamespace()
    size = hyp["input_img_size"][0]
    h = dict(hyp)
    h.update({"device": "cpu", "num_class": nc})
    dataset, dataloader, _ = mod.build_dataloader(
        str(root / "train" / "images"), str(root / "train" / "labels_ref"),
        str(root / "names.txt"), [size, size], h, 1 << 30, True, seed,
        hyp["batch_size"], 0, False, True, True,
    )
    it = iter(dataloader)
    counts, ws, hs, areas, pm, ps = [], [], [], [], [], []
    for _ in range(batches):
        x = next(it)
        img, ann = x["img"].numpy(), x["ann"].numpy()
        # reference collate: (B, M, 6) rows [cls?..] — detect layout from
        # the valid mask; boxes are xyxy in letterboxed coords
        for i in range(ann.shape[0]):
            a = ann[i]
            valid = (a >= 0).all(axis=1)
            av = a[valid]
            counts.append(len(av))
            if len(av):
                # layout [x1,y1,x2,y2,cls,?] vs [cls,x1,..]: take the 4
                # contiguous cols with the largest spread as coords
                c0 = av[:, 0:4] if av[:, 0:4].max() > nc else av[:, 1:5]
                ws.extend((c0[:, 2] - c0[:, 0]).tolist())
                hs.extend((c0[:, 3] - c0[:, 1]).tolist())
                areas.extend(((c0[:, 2] - c0[:, 0]) * (c0[:, 3] - c0[:, 1])).tolist())
        fimg = img.astype(np.float32)
        if fimg.max() > 1.5:
            fimg /= 255.0
        pm.append(fimg.mean())
        ps.append(fimg.std())
    return summarize("reference", counts, ws, hs, areas, pm, ps)


def our_side(root, hyp, batches, seed=7):
    from yoloseries_tpu.configs.config import TrainConfig
    from yoloseries_tpu.data.dataset import DetectionDataset
    from yoloseries_tpu.data.loader import DataLoader

    root = Path(root)
    size = hyp["input_img_size"][0]
    aug = TrainConfig.from_hyp(hyp, num_class=8).aug
    ds = DetectionDataset(
        root / "train" / "images", root / "train" / "labels",
        root / "names.txt", input_size=(size, size), aug=aug,
        cache_images=True,
    )
    loader = DataLoader(ds, batch_size=hyp["batch_size"], workers=2,
                        seed=seed, max_labels=hyp.get("max_labels", 300))
    counts, ws, hs, areas, pm, ps = [], [], [], [], [], []
    try:
        it = iter(loader)
        for _ in range(batches):
            b = next(it)
            ann = b["ann"]
            for i in range(ann.shape[0]):
                a = ann[i]
                valid = a[:, 4] >= 0
                av = a[valid]
                counts.append(len(av))
                if len(av):
                    ws.extend((av[:, 2] - av[:, 0]).tolist())
                    hs.extend((av[:, 3] - av[:, 1]).tolist())
                    areas.extend(((av[:, 2] - av[:, 0]) * (av[:, 3] - av[:, 1])).tolist())
            fimg = b["img"].astype(np.float32) / 255.0
            pm.append(fimg.mean())
            ps.append(fimg.std())
    finally:
        loader.stop()
    return summarize("ours", counts, ws, hs, areas, pm, ps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/parity_ds")
    ap.add_argument("--cfg", default=str(REPO / "docs" / "parity_320.yaml"))
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--side", choices=["ref", "ours", "both"], default="both")
    args = ap.parse_args()
    hyp = flat_hyp(args.cfg)
    if args.side in ("ref", "both"):
        ref_side(args.root, hyp, args.batches)
    if args.side in ("ours", "both"):
        our_side(args.root, hyp, args.batches)


if __name__ == "__main__":
    main()
