#!/bin/bash
# Predictor noise-augmentation A/B (reference --add_noise, train_jta.py:
# 115-117): retrain the r4b predictor with gaussian jitter on observed
# trajectory tokens, evaluate on the same ndjson test split at the
# val-calibrated filter threshold, next to the r4b (no-noise) numbers.
set -u
RUN="python -m emloco_tpu.cli.run"
OUT=output/pipeline_r7noise
DATA=output/data
VNET=output/pipeline_r4/valuenet_00000399.ckpt
mkdir -p "$OUT"

if [ ! -e $OUT/predictor_best.ckpt ]; then
  $RUN train-predictor --config configs/jta_predictor.yaml \
    --valuenet $VNET --batch-size 16 --batches 50 out_dir=$OUT epochs=30 \
    predict.traj_noise_std=0.05 \
    ndjson=$DATA/jta_synth_train.ndjson ndjson_val=$DATA/jta_synth_val.ndjson \
    >> $OUT/log.txt 2>&1
fi
if [ ! -e $OUT/eval.done ]; then
  $RUN eval-predictor --config configs/jta_predictor.yaml \
    --predictor $OUT/predictor_best.ckpt --valuenet $VNET \
    --batch-size 16 --batches 30 --threshold 0.3 --sweep-thresholds \
    out_dir=$OUT \
    ndjson=$DATA/jta_synth_train.ndjson ndjson_val=$DATA/jta_synth_test.ndjson \
    >> $OUT/eval_log.txt 2>&1 \
  && touch $OUT/eval.done
fi
echo "chain_r10 done $(date -u)"
