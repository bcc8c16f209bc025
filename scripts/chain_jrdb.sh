#!/bin/bash
# JRDB end-to-end pipeline (VERDICT r3 item: the paper's second dataset
# family): generate JRDB-format all-visual-cues exports (traj + 2D box +
# 3D pose, reference jrdb_all_visual_cues.yaml token_num 26 / model_jrdb.py),
# train the predictor with the EmLoco value loss (poses consumed UN-flipped,
# train_jrdb.py:187), then the threshold-calibrated LocoVal filter eval.
# Reuses the pipeline_r12 flagship valuenet.
set -u
OUT=output/pipeline_jrdb
DATA=output/data_jrdb
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

# 1. JRDB-format exports
phase "$DATA/jrdb_synth_test.ndjson" "jrdb exports" \
  python scripts/make_jrdb_export.py "$DATA"

# 2. predictor with the EmLoco loss through the 2dbox+3dpose cue path
phase "$OUT/predictor_best.ckpt" "jrdb predictor (EmLoco loss)" \
  $RUN train-predictor --config configs/jrdb_predictor.yaml \
    --valuenet $VNET --batch-size 16 --batches 50

# 3. filter eval: threshold sweep + test split at the calibrated 0.3
phase "$OUT/eval.done" "jrdb filter eval" \
  bash -c "$RUN eval-predictor --config configs/jrdb_predictor.yaml \
    --predictor $OUT/predictor_best.ckpt --valuenet $VNET \
    --batch-size 16 --batches 30 --threshold 0.3 --sweep-thresholds --plots \
    ndjson_val=$DATA/jrdb_synth_test.ndjson \
  && touch $OUT/eval.done"

echo "=== chain_jrdb complete $(date -u)" >> "$LOG"
