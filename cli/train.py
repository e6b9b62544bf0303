"""Train any detector family: one entry point instead of six train_*.py clones.

    python cli/train.py --model yolov5s --cfg yoloseries_tpu/configs/presets/train_yolov5.yaml \
        --train-img-dir ... --train-lab-dir ... [--val-img-dir ... --val-lab-dir ...]

Reference: train_yolov5.py __main__ (:827-870) + scripts/run_training.sh.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default=None, help="YAML config (reference format)")
    p.add_argument("--model", default="yolov5s")
    p.add_argument("--train-img-dir", required=True)
    p.add_argument("--train-lab-dir", required=True)
    p.add_argument("--val-img-dir", default=None)
    p.add_argument("--val-lab-dir", default=None)
    p.add_argument("--name-path", default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--total-epoch", type=int, default=None)
    p.add_argument("--input-size", type=int, default=None)
    p.add_argument("--output-dir", default="runs")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    p.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="override any flattened hyp key (YAML-typed), e.g. "
             "--set device_aug=true --set data_aug_mixup_p=0.5",
    )
    return p.parse_args()


def main():
    args = parse_args()
    import jax.numpy as jnp

    from yoloseries_tpu.configs import TrainConfig, load_hyp
    from yoloseries_tpu.data.dataset import DetectionDataset, load_names
    from yoloseries_tpu.parallel import maybe_initialize_distributed
    from yoloseries_tpu.train import Trainer

    # multi-host: no-op single-process; initializes jax.distributed when
    # JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID are set
    # (reference contract: utils/launch.py:39-84)
    maybe_initialize_distributed(log_fn=print)

    hyp = load_hyp(args.cfg) if args.cfg else {}
    if args.batch_size:
        hyp["batch_size"] = args.batch_size
    if args.total_epoch:
        hyp["total_epoch"] = args.total_epoch
    if args.input_size:
        hyp["input_img_size"] = [args.input_size, args.input_size]
    for kv in args.set:
        import yaml

        key, _, value = kv.partition("=")
        hyp[key.strip()] = yaml.safe_load(value)

    num_class = (
        max(load_names(args.name_path)) + 1 if args.name_path else None
    )
    if num_class is None:
        probe = DetectionDataset(args.train_img_dir, args.train_lab_dir)
        num_class = probe.num_class

    cfg = TrainConfig.from_hyp(
        hyp, num_class=num_class, model=args.model, output_dir=args.output_dir
    )
    trainer = Trainer(
        cfg,
        (args.train_img_dir, args.train_lab_dir),
        val_dirs=(args.val_img_dir, args.val_lab_dir)
        if args.val_img_dir
        else None,
        names_path=args.name_path,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    if args.resume:
        trainer.load()

    eval_fn = None
    if trainer.val_dataset is not None:
        eval_fn = lambda tr: tr.evaluate()
    try:
        trainer.train(eval_fn=eval_fn)
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
