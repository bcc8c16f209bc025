#!/bin/bash
# JTA pipeline refresh after the pose-convention fix: synthetic JTA exports
# now carry raw z-DOWN poses (the real JTA convention the consumption flip
# undoes, train_jta.py:266) so the valuenet scores physical z-up skeletons.
# Regenerates the exports, retrains the EmLoco-loss predictor against the
# pipeline_r12 flagship valuenet, and re-runs the calibrated filter eval
# (+ the new 3-D pose visualizer artifacts via --plots).
set -u
OUT=output/pipeline_r15
DATA=output/data_v2
VNET=output/pipeline_r12/valuenet_final.ckpt
LOG=$OUT/log.txt
mkdir -p "$OUT"
RUN="python -m emloco_tpu.cli.run"

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

# 1. regenerated JTA exports (z-down raw poses)
phase "$DATA/jta_synth_test.ndjson" "jta exports v2" \
  python scripts/make_jta_export.py "$DATA"

# 2. predictor with the EmLoco loss on the corrected exports
phase "$OUT/predictor_best.ckpt" "predictor v2 (EmLoco loss)" \
  $RUN train-predictor --config configs/jta_predictor.yaml \
    --valuenet $VNET --batch-size 16 --batches 50 \
    out_dir=$OUT epochs=30 \
    ndjson=$DATA/jta_synth_train.ndjson ndjson_val=$DATA/jta_synth_val.ndjson

# 3. filter eval + threshold sweep + plots (incl. vis3d/) on the test split
phase "$OUT/eval.done" "filter eval v2" \
  bash -c "$RUN eval-predictor --config configs/jta_predictor.yaml \
    --predictor $OUT/predictor_best.ckpt --valuenet $VNET \
    --batch-size 16 --batches 30 --threshold 0.3 --sweep-thresholds --plots \
    out_dir=$OUT \
    ndjson=$DATA/jta_synth_train.ndjson ndjson_val=$DATA/jta_synth_test.ndjson \
  && touch $OUT/eval.done"

echo "=== chain_r15 complete $(date -u)" >> "$LOG"
