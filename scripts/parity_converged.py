"""Converged-model mAP parity vs the EXECUTED reference trainer
(VERDICT r4 Missing #1 / Next #2).

The loss/eval/trajectory oracles pin losses, N-step parameter trajectories
and postprocess; this closes the last gap: train a model to convergence
with EACH framework's full stack on the same dataset and compare final
mAP50 under the reference validation protocol
(/root/reference/config/validation.yaml:4-8).

Reference side = the reference's OWN code executed on torch CPU:
its YOLODataset + mosaic/mixup augmentation + InfiniteSampler + collate
(dataset/data_loader.py:57-89), its model (models/normal/yolov5s.py), loss
(loss/yolov5_loss.py), optimizer groups / warmup / scheduler / EMA driven
UNBOUND exactly like tests/test_trajectory_oracle.py (only the ~20-line
loop skeleton of train_yolov5.py:310-368 is re-driven here), and its
evaluator + mAP_v2 (trainer/eval_yolov5.py, utils/mAP.py, un-letterbox
from train_yolov5.py:458-497, 631-647).

Our side = cli/train.py + cli/val.py, run as the user would.

Both read docs/parity_320.yaml. Runnable in-environment on the synthetic
dataset; on real COCO/VOC, point --root at a folder in the same layout.

Usage:
  python scripts/parity_converged.py gen    --root /tmp/parity_ds
  python scripts/parity_converged.py ref    --root /tmp/parity_ds
  python scripts/parity_converged.py ours   --root /tmp/parity_ds
  python scripts/parity_converged.py report
"""

import argparse
import json
import re
import subprocess
import sys
import time
import types
from pathlib import Path

import numpy as np
import yaml

REPO = Path(__file__).resolve().parent.parent
CFG = REPO / "docs" / "parity_320.yaml"
OUT_DIR = REPO / "runs_chip"
SEED = 7


def flat_hyp():
    raw = yaml.safe_load(CFG.read_text())
    hyp = {}
    for section in raw.values():
        hyp.update(section)
    return hyp


def ds_paths(root):
    root = Path(root)
    return {
        "train_img": root / "train" / "images",
        "train_lab": root / "train" / "labels",
        "train_lab_ref": root / "train" / "labels_ref",
        "val_img": root / "val" / "images",
        "val_lab": root / "val" / "labels",
        "val_lab_ref": root / "val" / "labels_ref",
        "names": root / "names.txt",
    }


def cmd_gen(args):
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_synthetic_dataset.py"),
         "--root", args.root, "--train", str(args.train), "--val",
         str(args.val), "--classes", str(args.classes), "--seed", "3"],
        check=True,
    )
    # the reference label format carries a "w h" HEADER line per txt
    # (dataset/datasets.py:343 reads it; :170 skiprows=1 skips it); ours
    # reads plain box lines. Emit a labels_ref/ twin with headers.
    from PIL import Image

    for split in ("train", "val"):
        p = ds_paths(args.root)
        img_dir = Path(args.root) / split / "images"
        lab_dir = Path(args.root) / split / "labels"
        ref_dir = Path(args.root) / split / "labels_ref"
        ref_dir.mkdir(exist_ok=True)
        for lab in sorted(lab_dir.glob("*.txt")):
            w, h = Image.open(img_dir / f"{lab.stem}.jpg").size
            ref_dir.joinpath(lab.name).write_text(
                f"{w} {h}\n" + lab.read_text()
            )
    print("labels_ref/ written (reference header format)")


# --------------------------------------------------------------------------
# reference side (torch CPU, executed reference code)
# --------------------------------------------------------------------------

def _ref_setup(hyp, nc):
    sys.path.insert(0, str(REPO / "tests"))
    from ref_loader import load_reference_training

    mod = load_reference_training()
    import torch

    torch.manual_seed(SEED)
    model = mod.YOLOV5Small(3, nc)
    return mod, model


def _ref_eval(mod, T, s, hyp, eval_model, paths, size, out_plot_dir):
    """Reference validation protocol: val loader -> evaluator -> un-letterbox
    -> mAP_v2 (val_yolov5.py:288-392 re-driven)."""
    import torch

    from yoloseries_tpu.ops import YOLOV5_ANCHORS

    # train_yolov5.py imports only build_dataloader; the val builder lives
    # in the same (already-loaded) reference dataset package
    build_val_dataloader = sys.modules["dataset"].build_val_dataloader
    _, val_loader, _ = build_val_dataloader(
        str(paths["val_img"]), str(paths["val_lab_ref"]), str(paths["names"]),
        [size, size], dict(s.hyp), 1 << 30, False, SEED, hyp["batch_size"], 0,
        False, False, False,
    )
    eval_model.eval()
    anchors_t = torch.tensor(np.asarray(YOLOV5_ANCHORS, np.float32))
    validater = mod.Evaluate(eval_model, anchors_t, s.hyp, compute_metric=True)

    all_preds, all_gts = [], []
    with torch.no_grad():
        for x in val_loader:
            imgs, infoes = x["img"], x["resize_info"]
            gt_bbox, gt_cls = T.gt_bbox_postprocess(s, x["ann"], infoes)
            outputs = validater(imgs)
            _, preds = T.preds_postprocess(s, imgs.cpu(), outputs, infoes)
            for j in range(len(preds)):
                if preds[j] is None or len(preds[j]) == 0:
                    all_preds.append(np.zeros((0, 6)))
                else:
                    p = preds[j]
                    all_preds.append(p[p[:, 5] >= 0])
            for gb, gc in zip(gt_bbox, gt_cls):
                all_gts.append(
                    np.concatenate([gb, gc[:, None].astype(np.float64)], 1)
                )
    mapv2 = mod.mAP_v2(all_gts, all_preds, out_plot_dir)
    mp_map, map50, mp, mr = mapv2.get_mean_metrics()
    return {"map": float(mp_map), "map50": float(map50),
            "mp": float(mp), "mr": float(mr)}


def _purge_ref_caches(root):
    """The reference's memmap image cache (datasets.py:277-322) trusts any
    existing cache file — an interrupted earlier run leaves an all-zeros
    w+-allocated file that a later run silently trains on (observed: a full
    48-epoch run on black images). Delete them so each run rebuilds."""
    n = 0
    for f in Path(root).glob("*/img_*_resized_cache_*.array"):
        f.unlink()
        n += 1
    if n:
        print(f"purged {n} stale reference cache file(s)")


def cmd_ref(args):
    import random

    import torch

    hyp = flat_hyp()
    paths = ds_paths(args.root)
    _purge_ref_caches(args.root)
    size = hyp["input_img_size"][0]
    nc = sum(1 for ln in paths["names"].read_text().splitlines() if ln.strip())
    if args.epochs:
        hyp["total_epoch"] = args.epochs

    mod, model = _ref_setup(hyp, nc)
    T = mod.Training
    from yoloseries_tpu.ops import YOLOV5_ANCHORS

    random.seed(SEED)
    np.random.seed(SEED)

    s = types.SimpleNamespace()
    s.hyp = dict(hyp)
    s.hyp.update({
        "device": "cpu", "num_class": nc, "half": False,
        "lr": hyp["basic_lr_per_img"] * hyp["batch_size"],
        "use_auxiliary_classifier": False,
    })
    s.model = model
    s.optimizer = T._init_optimizer(s)
    sched = T._init_scheduler(s)
    s.accumulate = hyp["accumulate_loss_step"] / hyp["batch_size"]

    dataset, dataloader, _ = mod.build_dataloader(
        str(paths["train_img"]), str(paths["train_lab_ref"]), str(paths["names"]),
        [size, size], dict(s.hyp), 1 << 30, True, SEED, hyp["batch_size"],
        args.workers, False, True, True,
    )
    spe = len(dataset) // hyp["batch_size"]
    epochs = hyp["total_epoch"]

    anchors_t = torch.tensor(np.asarray(YOLOV5_ANCHORS, np.float32))
    loss_fcn = mod.loss_fnc(anchors_t, s.hyp)
    ema = mod.ExponentialMovingAverageModel(model)

    log, t0 = [], time.time()
    it = iter(dataloader)
    model.train()
    model.zero_grad()
    no_aug = False
    imgs_cache = getattr(dataset, "imgs", None)
    if imgs_cache is not None:
        cache_std = float(np.asarray(imgs_cache[:8], np.float32).std())
        assert cache_std > 1.0, (
            f"degenerate reference image cache (std {cache_std:.4f}) — "
            "stale zeros from an interrupted caching run?"
        )
    for epoch in range(epochs):
        # no-aug tail (train_yolov5.py:288-293)
        if not no_aug and epoch == epochs - hyp["no_data_aug_epoch"]:
            dataloader.close_data_aug()
            no_aug = True
        ep_loss = 0.0
        for i in range(spe):
            t = spe * epoch + i + 1
            x = next(it)
            img = x["img"].to("cpu")
            ann = x["ann"].to("cpu")
            T.warmup(s, t)
            preds = model(img)
            ld = loss_fcn(preds, ann)
            ld["tot_loss"].backward()
            if (i + 1) % max(int(s.accumulate), 1) == 0:
                torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm=10.0)
                s.optimizer.step()
                s.optimizer.zero_grad()
                ema.update(model)
            ep_loss += float(ld["tot_loss"])
        sched.step()
        log.append({"epoch": epoch + 1, "loss": ep_loss / spe,
                    "lr": float(s.optimizer.param_groups[0]["lr"]),
                    "elapsed_s": round(time.time() - t0, 1)})
        print(json.dumps(log[-1]), flush=True)

    torch.save({"model": model.state_dict(), "ema": ema.ema.state_dict()},
               args.ckpt or "/tmp/parity_ref_final.pth")

    metrics = _ref_eval(mod, T, s, hyp, ema.ema, paths, size,
                        "/tmp/parity_ref_curves")
    result = {
        "side": "reference (executed, torch CPU)",
        "epochs": epochs, "steps_per_epoch": spe,
        "final": metrics, "train_log": log,
        "wall_s": round(time.time() - t0, 1),
    }
    out = OUT_DIR / "parity_ref.json"
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps({"final": metrics, "out": str(out)}))


# --------------------------------------------------------------------------
# our side (cli/train.py + cli/val.py, the user-facing path)
# --------------------------------------------------------------------------

def cmd_ours(args):
    hyp = flat_hyp()
    paths = ds_paths(args.root)
    size = hyp["input_img_size"][0]
    outdir = Path(args.outdir or "/tmp/parity_ours")
    t0 = time.time()
    train_cmd = [
        sys.executable, str(REPO / "cli" / "train.py"),
        "--cfg", str(CFG), "--model", "yolov5s",
        "--train-img-dir", str(paths["train_img"]),
        "--train-lab-dir", str(paths["train_lab"]),
        "--name-path", str(paths["names"]),
        "--output-dir", str(outdir),
    ]
    if args.epochs:
        train_cmd += ["--total-epoch", str(args.epochs)]
    for kv in args.set or []:
        train_cmd += ["--set", kv]
    if args.bf16:
        train_cmd.append("--bf16")
    subprocess.run(train_cmd, check=True, cwd=str(REPO))
    train_s = time.time() - t0

    val = subprocess.run(
        [sys.executable, str(REPO / "cli" / "val.py"),
         "--cfg", str(CFG), "--model", "yolov5s",
         "--ckpt-dir", str(outdir / "checkpoints"),
         "--val-img-dir", str(paths["val_img"]),
         "--val-lab-dir", str(paths["val_lab"]),
         "--name-path", str(paths["names"]),
         "--input-size", str(size), "--batch-size", "8"],
        check=True, cwd=str(REPO), capture_output=True, text=True,
    )
    print(val.stdout[-2000:])
    m = re.search(
        r"mAP@0\.5:0\.95 ([\d.]+)\s+mAP@0\.5 ([\d.]+)\s+P ([\d.]+)\s+R ([\d.]+)",
        val.stdout,
    )
    if not m:
        raise SystemExit(f"could not parse val output:\n{val.stdout[-3000:]}")
    metrics = {"map": float(m.group(1)), "map50": float(m.group(2)),
               "mp": float(m.group(3)), "mr": float(m.group(4))}
    result = {
        "side": "ours (cli/train.py + cli/val.py)",
        "bf16": bool(args.bf16), "overrides": args.set or [],
        "final": metrics, "train_wall_s": round(train_s, 1),
    }
    suffix = "_bf16" if args.bf16 else ""
    out = OUT_DIR / f"parity_ours{suffix}.json"
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps({"final": metrics, "out": str(out)}))


def cmd_report(args):
    ref = json.loads((OUT_DIR / "parity_ref.json").read_text())
    ours = json.loads((OUT_DIR / "parity_ours.json").read_text())
    rows = [("reference (executed)", ref["final"]),
            ("ours f32", ours["final"])]
    bf16 = OUT_DIR / "parity_ours_bf16.json"
    if bf16.exists():
        rows.append(("ours bf16", json.loads(bf16.read_text())["final"]))
    print(f"{'side':24s} {'mAP50':>8s} {'mAP':>8s} {'P':>8s} {'R':>8s}")
    for name, m in rows:
        print(f"{name:24s} {m['map50']:8.4f} {m['map']:8.4f} "
              f"{m['mp']:8.4f} {m['mr']:8.4f}")
    delta = abs(ref["final"]["map50"] - ours["final"]["map50"])
    verdict = "PASS" if delta <= 0.005 else "FAIL"
    print(f"|delta mAP50| = {delta:.4f} -> {verdict} (bar: 0.5 pts)")
    (OUT_DIR / "parity_converged.json").write_text(json.dumps({
        "rows": {n: m for n, m in rows},
        "delta_map50": delta, "verdict": verdict,
        "config": str(CFG.relative_to(REPO)),
    }, indent=1))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gen")
    g.add_argument("--root", required=True)
    g.add_argument("--train", type=int, default=128)
    g.add_argument("--val", type=int, default=64)
    g.add_argument("--classes", type=int, default=8)
    g.set_defaults(fn=cmd_gen)
    r = sub.add_parser("ref")
    r.add_argument("--root", required=True)
    r.add_argument("--epochs", type=int, default=None)
    r.add_argument("--workers", type=int, default=0)
    r.add_argument("--ckpt", default=None)
    r.set_defaults(fn=cmd_ref)
    o = sub.add_parser("ours")
    o.add_argument("--root", required=True)
    o.add_argument("--epochs", type=int, default=None)
    o.add_argument("--outdir", default=None)
    o.add_argument("--bf16", action="store_true")
    o.add_argument("--set", action="append", default=[])
    o.set_defaults(fn=cmd_ours)
    p = sub.add_parser("report")
    p.set_defaults(fn=cmd_report)
    args = ap.parse_args()
    sys.path.insert(0, str(REPO))
    args.fn(args)


if __name__ == "__main__":
    main()
