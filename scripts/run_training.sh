#!/bin/bash
# Canonical training invocation (reference: scripts/run_training.sh).
# Any registered --model works: yolov5{s,m,l,x}[_dw], yolov7, yolov8[nsm],
# yolox_{s,m,l}, yolox_darknet{21,53}, retinanet[_experiment], fcos[_cspnet].
set -e
python cli/train.py \
  --model yolov5s \
  --cfg yoloseries_tpu/configs/presets/train_yolov5.yaml \
  --train-img-dir "$DATASET/train/img" \
  --train-lab-dir "$DATASET/train/lab" \
  --val-img-dir "$DATASET/val/img" \
  --val-lab-dir "$DATASET/val/lab" \
  --name-path "$DATASET/train/names.txt" \
  --output-dir runs/yolov5s \
  --bf16 \
  "$@"
