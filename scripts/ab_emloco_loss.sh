#!/bin/bash
# The EmLoco-loss A/B (VERDICT r4 next-round #2): same seed, same data,
# same epochs — two arms differing ONLY in the differentiable LocoVal
# penalty (reference train_jta.py:288-308), then a filter-instrumented
# eval of both with the SAME frozen valuenet. Answers the paper's headline
# mechanism question in isolation: does the EmLoco loss improve (or
# degrade, as it measurably did for EqMotion/ETH-UCY) Social-Transmotion?
# Resumable per phase.
set -u
RUN="python -m emloco_tpu.cli.run"
DATA=output/data_v2
VNET=output/pipeline_r12/valuenet_final.ckpt
OUT=output/ab_emloco
LOG=$OUT/log.txt
mkdir -p "$OUT"

phase() {
  local artifact=$1 header=$2; shift 2
  if [ -e "$artifact" ]; then
    echo "=== skip $header (exists: $artifact)" | tee -a "$LOG"
    return 0
  fi
  for attempt in 1 2 3; do
    echo "=== $header (attempt $attempt) $(date -u)" | tee -a "$LOG"
    "$@" >> "$LOG" 2>&1 && [ -e "$artifact" ] && return 0
    echo "=== $header attempt $attempt failed rc=$? $(date -u)" | tee -a "$LOG"
    sleep 60
  done
  echo "=== $header GAVE UP $(date -u)" | tee -a "$LOG"
  return 1
}

# Arm w=0: value loss off; everything else identical (seed 0 from config)
phase "$OUT/w0/predictor_best.ckpt" "train arm w=0" \
  $RUN train-predictor --config configs/jta_predictor.yaml \
    --valuenet $VNET --batch-size 16 --batches 50 epochs=30 \
    out_dir=$OUT/w0 predict.use_value_loss=false \
    ndjson=$DATA/jta_synth_train.ndjson ndjson_val=$DATA/jta_synth_val.ndjson

# Arm w=0.3: the calibrated weight (configs/jta_predictor.yaml default)
phase "$OUT/w03/predictor_best.ckpt" "train arm w=0.3" \
  $RUN train-predictor --config configs/jta_predictor.yaml \
    --valuenet $VNET --batch-size 16 --batches 50 epochs=30 \
    out_dir=$OUT/w03 \
    ndjson=$DATA/jta_synth_train.ndjson ndjson_val=$DATA/jta_synth_val.ndjson

for arm in w0 w03; do
  phase "$OUT/$arm/eval.done" "eval arm $arm" \
    bash -c "$RUN eval-predictor --config configs/jta_predictor.yaml \
      --predictor $OUT/$arm/predictor_best.ckpt --valuenet $VNET \
      --batch-size 16 --batches 30 --sweep-thresholds out_dir=$OUT/$arm \
      ndjson=$DATA/jta_synth_train.ndjson \
      ndjson_val=$DATA/jta_synth_test.ndjson \
    && touch $OUT/$arm/eval.done"
done
echo "=== ab_emloco complete $(date -u)" | tee -a "$LOG"
