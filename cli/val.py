"""Standalone mAP validation — one entry point instead of four val_*.py
clones (val_{yolov5,yolov7,yolox,retinanet_experiment}.py).

    python cli/val.py --model yolov5s --ckpt-dir runs/checkpoints \
        --val-img-dir ... --val-lab-dir ... [--tta]

Protocol mirrors val_yolov5.py:288-396: EMA weights when available, loose
thresholds conf=0.001 / iou=0.65, un-letterboxed preds and gts, mAP_v2
metrics, optional per-class report.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default=None)
    p.add_argument("--model", default="yolov5s")
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--val-img-dir", required=True)
    p.add_argument("--val-lab-dir", required=True)
    p.add_argument("--name-path", default=None)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--input-size", type=int, default=640)
    p.add_argument("--tta", action="store_true")
    p.add_argument("--plot-dir", default=None, help="save P/R/F1/PR curves")
    p.add_argument("--params", choices=["ema", "raw"], default="ema",
                   help="evaluate EMA weights (reference default, "
                        "train_yolov5.py validates ema.ema) or the raw "
                        "trained params (diagnostics)")
    p.add_argument("--max-batches", type=int, default=None)
    # offline-mAP debugging dumps (`save_pred_bbox`/`save_gt_bbox`,
    # train_yolov5.py:758-762): pickle the per-image (n, 6) predictions and
    # (n, 5) gts in original-image coordinates
    p.add_argument("--save-pkl-dir", default=None,
                   help="dump pred_bbox.pkl / gt_bbox.pkl here")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import numpy as np

    from yoloseries_tpu.configs import load_hyp
    from yoloseries_tpu.data import DataLoader, DetectionDataset
    from yoloseries_tpu.evaluation import EvalConfig, Evaluator
    from yoloseries_tpu.families import get_family
    from yoloseries_tpu.models import create_model
    from yoloseries_tpu.ops.metrics import DetectionMetrics, plot_metrics
    from yoloseries_tpu.train import restore_checkpoint
    from yoloseries_tpu.train.optim import OptimizerConfig, build_optimizer
    from yoloseries_tpu.train.state import create_train_state

    hyp = load_hyp(args.cfg) if args.cfg else {}
    hyp.setdefault("use_tta", args.tta)
    input_size = (args.input_size, args.input_size)

    dataset = DetectionDataset(
        args.val_img_dir, args.val_lab_dir, args.name_path,
        input_size=input_size, enable_aug=False,
    )
    num_class = dataset.num_class

    # s2d_stem changes the stem-kernel layout in the checkpoint — the val
    # model must be built with the same knob the training run used.
    model_kw = {"s2d_stem": True} if hyp.get("s2d_stem") else {}
    model = create_model(args.model, num_class=num_class, **model_kw)
    family = get_family(args.model)
    loss_fn, balances0 = family.make_loss(hyp, num_class, input_size)
    decode_fn = family.make_decode(hyp, num_class, input_size)

    tx = build_optimizer(
        OptimizerConfig(batch_size=args.batch_size),
        model.init(jax.random.PRNGKey(0),
                   np.zeros((1, *input_size, 3), np.float32), train=False)["params"],
    )
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (1, *input_size, 3), balances=balances0)
    state, step = restore_checkpoint(args.ckpt_dir, state)
    if step is None:
        raise SystemExit(f"no checkpoint under {args.ckpt_dir}")
    print(f"loaded checkpoint at step {step}")

    eval_cfg = EvalConfig(
        conf_threshold=hyp.get("compute_metric_conf_threshold", 0.001),
        cls_threshold=hyp.get("compute_metric_cls_threshold", 0.001),
        iou_threshold=hyp.get("compute_metric_iou_threshold", 0.65),
        num_candidates=hyp.get("eval_num_candidates",
                               hyp.get("pre_nms_topk", 4096)),
        max_keep=hyp.get("max_predictions_per_img", 300),
        use_tta=hyp.get("use_tta", False),
    )
    eval_cfg = family.apply_eval_overrides(eval_cfg, hyp)
    select_builder = (family.make_select(hyp, num_class, input_size)
                      if family.make_select else None)
    evaluator = Evaluator(
        model.apply, decode_fn, eval_cfg,
        select_fn=select_builder(eval_cfg) if select_builder else None,
    )
    if args.params == "raw":
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
    else:
        variables = {"params": state.ema_params}
        if state.ema_batch_stats:
            variables["batch_stats"] = state.ema_batch_stats

    loader = DataLoader(dataset, batch_size=args.batch_size, shuffle=False,
                        infinite=False, enable_aug=False)
    metrics = DetectionMetrics()
    all_preds, all_gts = [], []
    try:
        for bi, batch in enumerate(loader):
            if args.max_batches is not None and bi >= args.max_batches:
                break
            dets = evaluator(variables, batch["img"])
            preds = Evaluator.to_host_detections(dets, batch["info"])
            for i in range(len(preds)):
                valid = batch["ann"][i][:, 4] >= 0
                gt = batch["ann"][i][valid]
                scale, pl, pt, ow, oh = batch["info"][i]
                g = np.zeros((int(valid.sum()), 5))
                g[:, 0] = ((gt[:, 0] - pl) / scale).clip(0, ow)
                g[:, 1] = ((gt[:, 1] - pt) / scale).clip(0, oh)
                g[:, 2] = ((gt[:, 2] - pl) / scale).clip(0, ow)
                g[:, 3] = ((gt[:, 3] - pt) / scale).clip(0, oh)
                g[:, 4] = gt[:, 4]
                metrics.add_image(g, preds[i])
                if args.save_pkl_dir:
                    p_i = preds[i]
                    all_preds.append(
                        np.zeros((0, 6)) if p_i is None else np.asarray(p_i)
                    )
                    all_gts.append(g)
    finally:
        loader.stop()

    if args.save_pkl_dir:
        import pickle
        from pathlib import Path

        pkl_dir = Path(args.save_pkl_dir)
        pkl_dir.mkdir(parents=True, exist_ok=True)
        size = args.input_size
        with open(pkl_dir / f"pred_bbox_{size}_{args.model}.pkl", "wb") as f:
            pickle.dump(all_preds, f)
        with open(pkl_dir / "gt_bbox.pkl", "wb") as f:
            pickle.dump(all_gts, f)
        print(f"prediction/gt pickles saved to {pkl_dir}")

    out = metrics.compute()
    print(
        f"mAP@0.5:0.95 {out['map']:.4f}  mAP@0.5 {out['map50']:.4f}  "
        f"P {out['mp']:.4f}  R {out['mr']:.4f}"
    )
    if args.plot_dir:
        plot_metrics(out, args.plot_dir, cls2lab=dataset.cls2name or None)
        print(f"curves saved to {args.plot_dir}")


if __name__ == "__main__":
    main()
