"""Folder inference — replaces the (stale) detect_yolov5.py.

    python cli/detect.py --model yolov5s --ckpt-dir runs/checkpoints \
        --img-dir photos/ --save-dir out/ [--conf 0.3] [--names names.txt]

Behavior per README.md:80-96 / train_yolov5.py test():771-806: load EMA
weights, letterbox (test mode, minimal padding is replaced by full-size
static padding for batch compilation), batched on-device decode+NMS, draw
boxes, emoji console counts.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yolov5s")
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--img-dir", required=True)
    p.add_argument("--save-dir", default="detect_out")
    p.add_argument("--name-path", default=None)
    p.add_argument("--num-class", type=int, default=None,
                   help="required when --name-path is absent")
    p.add_argument("--input-size", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--conf", type=float, default=0.3)
    p.add_argument("--iou", type=float, default=0.2)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--s2d-stem", action="store_true",
                   help="checkpoint was trained with s2d_stem: true")
    # deploy-time graph folding before inference (detect_yolov5.py:110-117:
    # the reference fuses conv+BN and reparameterizes RepConv on load).
    # Under jit BN folding is a compile-time no-op for latency; it is kept
    # for checkpoint-export parity and to drop BN state from serving
    # artifacts. --no-fuse disables it.
    p.add_argument("--no-fuse", dest="fuse", action="store_false")
    p.set_defaults(fuse=True)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from yoloseries_tpu.data.dataset import IMG_EXTENSIONS, load_names
    from yoloseries_tpu.evaluation import EvalConfig, Evaluator
    from yoloseries_tpu.families import get_family
    from yoloseries_tpu.models import create_model
    from yoloseries_tpu.ops.letterbox import letterbox_image
    from yoloseries_tpu.train import restore_checkpoint
    from yoloseries_tpu.train.optim import OptimizerConfig, build_optimizer
    from yoloseries_tpu.train.state import create_train_state
    from yoloseries_tpu.utils.visualize import detection_report, save_detection_image

    names = None
    if args.name_path:
        table = load_names(args.name_path)
        num_class = max(table) + 1
        names = [table.get(i, str(i)) for i in range(num_class)]
    elif args.num_class:
        num_class = args.num_class
    else:
        raise SystemExit("pass --name-path or --num-class")

    input_size = (args.input_size, args.input_size)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model_kw = {"s2d_stem": True} if args.s2d_stem else {}
    model = create_model(args.model, num_class=num_class, dtype=dtype, **model_kw)
    family = get_family(args.model)
    _, balances0 = family.make_loss({}, num_class, input_size)
    decode_fn = family.make_decode({}, num_class, input_size)

    tx = build_optimizer(
        OptimizerConfig(),
        model.init(jax.random.PRNGKey(0),
                   np.zeros((1, *input_size, 3), np.float32), train=False)["params"],
    )
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (1, *input_size, 3), balances=balances0)
    state, step = restore_checkpoint(args.ckpt_dir, state)
    if step is None:
        raise SystemExit(f"no checkpoint under {args.ckpt_dir}")
    print(f"loaded checkpoint at step {step}")

    eval_cfg = EvalConfig(conf_threshold=args.conf, cls_threshold=args.conf,
                          iou_threshold=args.iou, merge_boxes=True)
    eval_cfg = family.apply_eval_overrides(eval_cfg)
    select_builder = (family.make_select({}, num_class, input_size)
                      if family.make_select else None)
    evaluator = Evaluator(
        model.apply, decode_fn, eval_cfg,
        select_fn=select_builder(eval_cfg) if select_builder else None,
    )
    variables = {"params": state.ema_params}
    if state.ema_batch_stats:
        variables["batch_stats"] = state.ema_batch_stats
    if args.fuse and state.ema_batch_stats:
        from yoloseries_tpu.nn.deploy import fold_conv_bn, fold_repconv

        params_f, stats_f = fold_conv_bn(
            variables["params"], variables["batch_stats"]
        )
        if family.name == "yolov7":
            # RepConv reparam (reference fuseforward before inference,
            # models/normal/yolov7.py:461-464): 3 branches -> one biased
            # 3x3 conv; rebuild the model in deploy mode to match the
            # reparameterized param tree
            params_f, stats_f = fold_repconv(params_f, stats_f)
            model = create_model(args.model, num_class=num_class,
                                 dtype=dtype, deploy=True, **model_kw)
            evaluator = Evaluator(
                model.apply, decode_fn, eval_cfg,
                select_fn=select_builder(eval_cfg) if select_builder else None,
            )
            print("reparameterized RepConv branches for deploy")
        variables = {"params": params_f, "batch_stats": stats_f}
        print("fused conv+bn for deploy (BN running stats absorbed into "
              "conv kernels; detections are bit-identical, see "
              "tests/test_aux_components.py)")

    paths = sorted(
        p for p in Path(args.img_dir).iterdir()
        if p.suffix.lower() in IMG_EXTENSIONS
    )
    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)

    for start in range(0, len(paths), args.batch_size):
        chunk = paths[start : start + args.batch_size]
        imgs, infos, raws = [], [], []
        for p in chunk:
            raw = np.asarray(Image.open(p).convert("RGB"))
            lb, info = letterbox_image(raw, input_size, stride=32, training=True)
            raws.append(raw)
            imgs.append(lb)
            infos.append(info.as_array())
        batch = np.zeros((args.batch_size, *input_size, 3), np.uint8)
        batch[: len(chunk)] = np.stack(imgs)
        t0 = time.perf_counter()
        dets = evaluator(variables, batch)
        dets.block_until_ready()
        dt = time.perf_counter() - t0
        preds = Evaluator.to_host_detections(
            dets[: len(chunk)], np.stack(infos)
        )
        for p, raw, det in zip(chunk, raws, preds):
            save_detection_image(raw, det, save_dir / p.name, names)
            n = 0 if det is None else len(det)
            print(
                f"{p.name}: {detection_report(det, names)} "
                f"({n} boxes, {dt / len(chunk):.3f}s/img)"
            )
    print(f"saved to {save_dir}")


if __name__ == "__main__":
    main()
