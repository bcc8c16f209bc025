#!/bin/bash
# Pipeline r4 follow-on: the REAL-DATA INGESTION PATH at full scale — train
# and evaluate the predictor through the ndjson all-visual-cues reader
# (reference Reader_jta_all_visual_cues, reader.py:144-266) on the
# faithful-format exports from scripts/make_jta_export.py, with the EmLoco
# value loss against the r4 valuenet. Paper protocol: min-over-20 ADE/FDE +
# observation-length sweep (evaluate_jta.py --all_frames).
set -u
OUT=output/pipeline_r4b
R4=output/pipeline_r4
DATA=output/data
LOG=$OUT/log.txt
mkdir -p "$OUT"

phase() {
  local artifact=$1 header=$2; shift 2
  if [ -e "$artifact" ]; then
    echo "=== skip $header (exists: $artifact)" >> "$LOG"
    return 0
  fi
  for attempt in 1 2 3; do
    echo "=== $header (attempt $attempt) $(date -u)" >> "$LOG"
    "$@" >> "$LOG" 2>&1 && [ -e "$artifact" ] && return 0
    echo "=== $header attempt $attempt failed rc=$? $(date -u)" >> "$LOG"
    sleep 60
  done
  echo "=== $header GAVE UP $(date -u)" >> "$LOG"
  return 1
}

RUN="python -m emloco_tpu.cli.run"
VNET=$R4/valuenet_00000399.ckpt
[ -e "$VNET" ] || VNET=output/pipeline_r3/valuenet_00000399.ckpt

phase "$OUT/predictor_best.ckpt" "predictor on ndjson (real-data path)" \
  $RUN train-predictor --config configs/jta_predictor.yaml \
    --valuenet $VNET --batch-size 16 --batches 50 out_dir=$OUT epochs=30 \
    ndjson=$DATA/jta_synth_train.ndjson ndjson_val=$DATA/jta_synth_val.ndjson

phase "$OUT/eval_pred.done" "eval predictor on ndjson test split" \
  bash -c "$RUN eval-predictor --config configs/jta_predictor.yaml \
    --predictor $OUT/predictor_best.ckpt --valuenet $VNET \
    --batch-size 16 --batches 30 --plots --all-frames out_dir=$OUT \
    ndjson=$DATA/jta_synth_train.ndjson ndjson_val=$DATA/jta_synth_test.ndjson \
  && touch $OUT/eval_pred.done"

echo "=== pipeline_r4b complete $(date -u)" >> "$LOG"
