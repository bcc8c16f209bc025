#!/bin/bash
# Quality-refresh pipeline: the r4 flagship policy stopped at 1,100 epochs
# (the reference budgets up to 150k, amp_humanoid_smpl_sept_task.yaml:91) —
# pretrain ~3x longer, retrain the hard-negative valuenet against it, refresh
# the eval grid, retrain the ndjson predictor with the EmLoco loss, and
# re-run the threshold-calibrated filter eval. Every downstream number
# (value corr, filter ADE) rides on pretrain quality.
#
# Interrupt-safe: the train phases resume from the newest intermediate ckpt
# with the remaining epoch budget, and each phase is retried through the
# known transient tunnel errors.
set -u
OUT=output/pipeline_r12
DATA=output/data
LOG=$OUT/log.txt
mkdir -p "$OUT"
RUN="python -m emloco_tpu.cli.run"

train_resumable() {  # train_resumable <final> <prefix> <total_epochs> <save_every> <cmd...>
  local final=$1 prefix=$2 total=$3 save=$4; shift 4
  [ -e "$final" ] && { echo "=== skip $prefix (exists)" >> "$LOG"; return 0; }
  for attempt in 1 2 3; do
    local latest epochs res=""
    # name-sort (not mtime) so the numerically-latest epoch wins even after
    # partial re-runs; ckpt numbering is absolute across resumes
    latest=$(ls "$OUT/${prefix}"_0*.ckpt 2>/dev/null | sort | tail -1)
    epochs=$total
    if [ -n "$latest" ]; then
      local n
      n=$((10#$(basename "$latest" .ckpt | awk -F_ '{print $NF}')))
      epochs=$((total - n - 1))
      res="--resume $latest"
      echo "=== $prefix resume from $latest, $epochs epochs left $(date -u)" >> "$LOG"
    fi
    if [ "$epochs" -le 0 ]; then
      cp "$latest" "$final"; return 0
    fi
    echo "=== $prefix (attempt $attempt, epochs=$epochs) $(date -u)" >> "$LOG"
    if "$@" epochs=$epochs save_every=$save $res >> "$LOG" 2>&1; then
      cp "$(ls "$OUT/${prefix}"_0*.ckpt | sort | tail -1)" "$final"
      return 0
    fi
    echo "=== $prefix attempt $attempt failed rc=$? $(date -u)" >> "$LOG"
    sleep 60
  done
  echo "=== $prefix GAVE UP $(date -u)" >> "$LOG"
  return 1
}

phase() {  # phase <artifact> <header> <cmd...>
  local artifact=$1 header=$2; shift 2
  [ -e "$artifact" ] && { echo "=== skip $header" >> "$LOG"; return 0; }
  for attempt in 1 2 3; do
    echo "=== $header (attempt $attempt) $(date -u)" >> "$LOG"
    "$@" >> "$LOG" 2>&1 && [ -e "$artifact" ] && return 0
    echo "=== $header attempt $attempt failed rc=$? $(date -u)" >> "$LOG"
    sleep 60
  done
  echo "=== $header GAVE UP $(date -u)" >> "$LOG"
  return 1
}

# 1. long policy pretrain
train_resumable "$OUT/policy_final.ckpt" policy 3000 250 \
  $RUN train-policy --config configs/pacer_terrain.yaml out_dir=$OUT

# 2. LocoVal valuenet, hard negatives on (default prob 0.5)
train_resumable "$OUT/valuenet_final.ckpt" valuenet 600 300 \
  $RUN train-valuenet --config configs/pacer_terrain.yaml \
    --policy $OUT/policy_final.ckpt out_dir=$OUT env.num_envs=1024

# 3. 4-condition eval grid + qualitative artifacts
phase "$OUT/eval_grid.done" "eval grid" \
  bash -c "$RUN eval-policy --config configs/pacer_terrain.yaml --grid --plots \
    --policy $OUT/policy_final.ckpt --valuenet $OUT/valuenet_final.ckpt \
    --games 4 out_dir=$OUT env.num_envs=1024 \
  && touch $OUT/eval_grid.done"

# 4. predictor through the ndjson ingestion path with the EmLoco value loss
phase "$OUT/predictor_best.ckpt" "predictor (EmLoco loss)" \
  $RUN train-predictor --config configs/jta_predictor.yaml \
    --valuenet $OUT/valuenet_final.ckpt --batch-size 16 --batches 50 \
    out_dir=$OUT epochs=30 \
    ndjson=$DATA/jta_synth_train.ndjson ndjson_val=$DATA/jta_synth_val.ndjson

# 5. filter eval: val-split threshold sweep, then the test split at 0.3
phase "$OUT/eval.done" "filter eval (calibrated)" \
  bash -c "$RUN eval-predictor --config configs/jta_predictor.yaml \
    --predictor $OUT/predictor_best.ckpt --valuenet $OUT/valuenet_final.ckpt \
    --batch-size 16 --batches 30 --threshold 0.3 --sweep-thresholds \
    out_dir=$OUT \
    ndjson=$DATA/jta_synth_train.ndjson ndjson_val=$DATA/jta_synth_test.ndjson \
  && touch $OUT/eval.done"

echo "=== chain_r12 complete $(date -u)" >> "$LOG"
