#!/usr/bin/env bash
# Everything blocked on the round-3 TPU relay outage, in priority order.
# Run from the repo root the moment `jax.devices()` answers again.
#
# Each step is independently restartable; persistent compile caches under
# /tmp make re-runs cheap. Expected total: ~1 h cold, ~15 min warm.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p runs_chip

echo "=== 0. relay sanity"
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "relay still down"; exit 1; }

echo "=== 1. prime compile caches"
bash scripts/warm_cache.sh || true

echo "=== 2. full bench (BENCH_r03 preview)"
timeout 3000 python bench.py | tee runs_chip/bench.jsonl

echo "=== 3. perf-variant sweep: s2d stem / remat+b256 / XLA flags"
timeout 6000 python scripts/sweep_xla_flags.py --quick \
  | tee runs_chip/sweep.jsonl
# full sweep if the quick one shows movement:
#   python scripts/sweep_xla_flags.py | tee runs_chip/sweep_full.jsonl
# If a variant wins, flip the bench default via BENCH_TRAIN_S2D/REMAT or
# make it the model default and note it in STATUS.md.

echo "=== 4. matrix-NMS small-batch before/after"
timeout 1200 python scripts/bench_nms_kernels.py | tee runs_chip/nms.jsonl

echo "=== 5. 640px dress rehearsal (2k synthetic imgs, full aug)"
# dataset: regenerate if /tmp was wiped
[ -d /tmp/synth2k/train/images ] || \
  python scripts/make_synthetic_dataset.py --root /tmp/synth2k
timeout 9000 python cli/train.py --model yolov5s --bf16 \
  --cfg docs/rehearsal_640.yaml \
  --train-img-dir /tmp/synth2k/train/images \
  --train-lab-dir /tmp/synth2k/train/labels \
  --val-img-dir /tmp/synth2k/val/images \
  --val-lab-dir /tmp/synth2k/val/labels \
  --name-path /tmp/synth2k/names.txt \
  --output-dir runs_chip/rehearsal640
echo "rising-mAP curve: grep 'mAP' runs_chip/rehearsal640/log/log_rank_0/train.log"

echo "=== done — fold numbers into STATUS.md"
