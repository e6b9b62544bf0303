#!/bin/bash
# Standalone mAP validation at the protocol thresholds
# (reference: scripts/run_validation.sh + config/validation.yaml).
set -e
python cli/val.py \
  --model yolov5s \
  --cfg yoloseries_tpu/configs/presets/validation.yaml \
  --val-img-dir "$DATASET/val/img" \
  --val-lab-dir "$DATASET/val/lab" \
  --name-path "$DATASET/val/names.txt" \
  --ckpt-dir runs/yolov5s/checkpoints \
  "$@"
