#!/bin/bash
# Folder inference with drawn boxes + emoji counts
# (reference: scripts/run_detection.sh + config/detection_yolov5.yaml).
set -e
python cli/detect.py \
  --model yolov5s \
  --img-dir "$DATASET/test/img" \
  --name-path "$DATASET/names.txt" \
  --ckpt-dir runs/yolov5s/checkpoints \
  --save-dir result/tmp \
  "$@"
