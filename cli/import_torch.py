"""Import a reference torch checkpoint into our orbax layout: one command
from a published .pth to something cli/val.py / cli/detect.py can load.

    python cli/import_torch.py --model yolov5s --pth yolov5_small_epoch_x.pth \
        --num-class 80 --out runs_import [--input-size 640]

Accepts both the reference Training.save_model dict
(train_yolov5.py:614-627: model_state_dict / ema / hyp / step) and a bare
state_dict. The EMA weights (what the reference validates with) fill
ema_params; the raw model fills params. Logit-level parity of every
converter is certified in tests/test_torch_parity_families.py and the
end-to-end eval oracles.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True,
                   help="yolov5s/m/l/x, yolox_s/..., yolov7, yolov8, "
                        "retinanet, fcos")
    p.add_argument("--pth", required=True, help="reference .pth checkpoint")
    p.add_argument("--num-class", type=int, required=True)
    p.add_argument("--out", required=True, help="output run dir (checkpoints/ "
                                                "is created inside)")
    p.add_argument("--input-size", type=int, default=640)
    p.add_argument("--s2d-stem", action="store_true",
                   help="convert the 6x6/2 stem to the space-to-depth layout "
                        "(exact reparam; pair with `s2d_stem: true` at "
                        "train/val time)")
    return p.parse_args()


def _converter(model_name: str):
    from yoloseries_tpu.utils import torch_import as ti

    if model_name.startswith("yolov5"):
        return ti.convert_yolov5_state_dict
    if model_name.startswith("yolox"):
        return ti.convert_yolox_state_dict
    if model_name.startswith("yolov7"):
        return ti.convert_yolov7_state_dict
    if model_name.startswith("yolov8"):
        return ti.convert_yolov8_state_dict
    if model_name.startswith("retinanet"):
        return ti.convert_retinanet_state_dict
    if model_name.startswith("fcos"):
        return ti.convert_fcos_state_dict
    raise SystemExit(f"no converter for {model_name}")


def main():
    args = parse_args()
    import jax
    import numpy as np
    import torch

    from yoloseries_tpu.families import get_family
    from yoloseries_tpu.models import create_model
    from yoloseries_tpu.train import save_checkpoint
    from yoloseries_tpu.train.optim import OptimizerConfig, build_optimizer
    from yoloseries_tpu.train.state import create_train_state

    blob = torch.load(args.pth, map_location="cpu", weights_only=False)
    hyp = {}
    step = 0
    if isinstance(blob, dict) and "model_state_dict" in blob:
        raw = blob["model_state_dict"]
        ema = blob.get("ema")
        hyp = blob.get("hyp") or {}
        step = int(blob.get("step") or 0)
    else:  # bare state_dict
        raw, ema = blob, None
    # DDP prefixes
    raw = { (k[7:] if k.startswith("module.") else k): v for k, v in raw.items() }
    convert = _converter(args.model)
    params, stats = convert(raw, args.num_class)
    if ema is not None:
        ema = { (k[7:] if k.startswith("module.") else k): v for k, v in ema.items() }
        ema_params, ema_stats = convert(ema, args.num_class)
    else:
        ema_params, ema_stats = params, stats

    if args.s2d_stem:
        from yoloseries_tpu.nn.deploy import fold_stem_to_s2d

        params = fold_stem_to_s2d(params)
        ema_params = fold_stem_to_s2d(ema_params)
        hyp["s2d_stem"] = True  # record the stem layout in the ckpt hyp

    model = create_model(args.model, num_class=args.num_class,
                         **({"s2d_stem": True} if args.s2d_stem else {}))
    family = get_family(args.model)
    _, balances0 = family.make_loss(
        hyp, args.num_class, (args.input_size, args.input_size)
    )
    tx = build_optimizer(
        OptimizerConfig(batch_size=int(hyp.get("batch_size", 8) or 8)),
        params,
    )
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (1, args.input_size, args.input_size, 3), balances=balances0,
    )
    state = state.replace(
        params=params, batch_stats=stats,
        ema_params=ema_params, ema_batch_stats=ema_stats,
        step=np.asarray(step, np.int32),
    )
    ckpt_dir = Path(args.out) / "checkpoints"
    save_checkpoint(ckpt_dir, state, max(step, 1), hyp=hyp)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"imported {args.pth} -> {ckpt_dir} (step {max(step, 1)}, "
          f"{n_params:,} params, ema={'yes' if ema is not None else 'copy'})")


if __name__ == "__main__":
    main()
