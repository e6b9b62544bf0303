#!/bin/bash
# Round-5 chip queue (VERDICT r4 Next #1/#4/#7). Run on an otherwise-idle
# host (memory: 1-core host — concurrent CPU work pollutes synced timing).
#
#   PYTHONPATH=/root/repo:$PYTHONPATH bash scripts/round5_chip_queue.sh
#
# Steps (each appends committed artifacts under runs_chip/):
#  1. pipelined step decomposition, flat vs cells candidate gather
#  2. lever sweep rows that never ran (width diagnostics) + r5 rows,
#     now with pipelined timing (levers_r4.jsonl rows paid the ~33 ms
#     relay round-trip per step; see STATUS round-5 log)
#  3. eval-protocol vs serving stage attribution
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

echo "== 1. step decomposition (flat vs cells gather) =="
python scripts/profile_train.py --stages fwd,loss,fwd_loss,full_step \
  | tee runs_chip/decomp_r5_flat.jsonl
python scripts/profile_train.py --stages fwd,loss,fwd_loss,full_step \
  --gather-mode cells | tee runs_chip/decomp_r5_cells.jsonl

echo "== 2. lever sweep (pipelined) =="
python scripts/sweep_xla_flags.py --only \
  baseline,gather_cells,gather_cells_latency_hiding,latency_hiding,vmem_128m,diag_yolov5m,diag_yolov5l \
  | tee runs_chip/levers_r5.jsonl

echo "== 3. eval-protocol stage attribution =="
python scripts/profile_eval_protocol.py | tee runs_chip/eval_gap_r5.jsonl
