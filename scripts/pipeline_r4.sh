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

# 4/5. predictor training + filter eval moved to pipeline_r4b.sh: the
# in-memory SyntheticScenes dataset regenerates every scene host-side each
# epoch (FK-heavy, ~minutes/epoch of pure data gen), while the ndjson path
# pre-windows the faithful-format exports once and samples from memory —
# and it exercises the real-data ingestion the reference's results run on.
# pipeline_r4d.sh re-runs the r3 synthetic filter eval against this round's
# valuenet for the hard-negative comparison.

echo "=== pipeline_r4 complete $(date -u)" >> "$LOG"
