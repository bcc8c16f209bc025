#!/bin/bash
# End-to-end EmLoco pipeline, round 4: policy pretrain -> LocoVal valuenet
# (heading-inversion hard negatives ON, value_train.py) -> 4-condition eval
# grid + qualitative artifacts -> Social-Transmotion predictor trained with
# the EmLoco value loss (scanned encoders) -> LocoVal filter eval.
#
# Resumable: each phase is a separate process guarded by its output artifact,
# so transient TPU-backend errors (CLAUDE.md) only cost one phase. Run from
# the repo root on the chip (ambient axon env vars untouched).
set -u
OUT=output/pipeline_r4
LOG=$OUT/log.txt
mkdir -p "$OUT"

phase() {  # phase <artifact> <header> <cmd...>
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

# 1. policy pretrain at full reference scale (1600 envs, mixed terrain)
phase "$OUT/policy_00001099.ckpt" "policy pretrain" \
  $RUN train-policy --config configs/pacer_terrain.yaml \
    out_dir=$OUT epochs=1100 save_every=400

# 2. LocoVal valuenet: frozen policy, hard negatives at prob 0.5 (default in
#    ValueTrainConfig.heading_inversion_prob; inverted_frac/inverted_target
#    land in valuenet.metrics.jsonl)
phase "$OUT/valuenet_00000399.ckpt" "valuenet (hard negatives)" \
  $RUN train-valuenet --config configs/pacer_terrain.yaml \
    --policy $OUT/policy_00001099.ckpt \
    out_dir=$OUT epochs=400 save_every=200 env.num_envs=1024

# 3. 4-condition eval grid + value scatter/histograms + reward-overlay GIF
phase "$OUT/eval_grid.done" "eval grid" \
  bash -c "$RUN eval-policy --config configs/pacer_terrain.yaml --grid --plots \
    --policy $OUT/policy_00001099.ckpt --valuenet $OUT/valuenet_00000399.ckpt \
    --games 4 out_dir=$OUT env.num_envs=1024 \
  && touch $OUT/eval_grid.done"

# 4. predictor trained on-chip with the EmLoco value loss against the NEW
#    valuenet (scanned encoder stacks keep the compile tractable)
phase "$OUT/predictor_best.ckpt" "predictor (EmLoco loss, scanned)" \
  $RUN train-predictor --config configs/jta_predictor.yaml \
    --valuenet $OUT/valuenet_00000399.ckpt \
    --batch-size 16 --batches 100 out_dir=$OUT epochs=30

# 5. filter eval: value-pick vs random vs oracle ADE + plots + obs-length sweep
phase "$OUT/eval_pred.done" "eval predictor (LocoVal filter)" \
  bash -c "$RUN eval-predictor --config configs/jta_predictor.yaml \
    --predictor $OUT/predictor_best.ckpt --valuenet $OUT/valuenet_00000399.ckpt \
    --batch-size 16 --batches 40 --plots --all-frames out_dir=$OUT \
  && touch $OUT/eval_pred.done"

echo "=== pipeline_r4 complete $(date -u)" >> "$LOG"
