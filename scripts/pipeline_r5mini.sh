#!/bin/bash
# Round-5 end-to-end validation chain on the post-gather-fix epoch:
# 300-epoch flat policy at the reference's 1,600-env scale -> 300-epoch
# LocoVal valuenet -> 4-condition grid. Comparable to r16_flat300
# (300-epoch flat baseline). Resumable per phase.
set -u
RUN="python -m emloco_tpu.cli.run"
OUT=output/pipeline_r5mini
LOG=$OUT/log.txt
mkdir -p "$OUT"

phase() {
  local artifact=$1 header=$2; shift 2
  [ -e "$artifact" ] && { echo "=== skip $header" | tee -a "$LOG"; return 0; }
  for attempt in 1 2 3; do
    echo "=== $header (attempt $attempt) $(date -u)" | tee -a "$LOG"
    "$@" >> "$LOG" 2>&1 && [ -e "$artifact" ] && return 0
    echo "=== $header failed rc=$? $(date -u)" | tee -a "$LOG"; sleep 60
  done
  return 1
}

phase "$OUT/policy_00000299.ckpt" "policy 300ep @1600" \
  $RUN train-policy --config configs/pacer_terrain.yaml out_dir=$OUT \
    env.num_envs=1600 env.hard_negative=true epochs=300 save_every=150

phase "$OUT/valuenet_00000299.ckpt" "valuenet 300ep" \
  $RUN train-valuenet --config configs/pacer_terrain.yaml \
    --policy $OUT/policy_00000299.ckpt out_dir=$OUT \
    env.num_envs=1600 env.hard_negative=true epochs=300

phase "$OUT/eval_grid.done" "grid eval" \
  bash -c "$RUN eval-policy --config configs/pacer_terrain.yaml --grid \
    --policy $OUT/policy_00000299.ckpt --valuenet $OUT/valuenet_00000299.ckpt \
    --games 4 out_dir=$OUT env.num_envs=1600 env.hard_negative=true \
  && touch $OUT/eval_grid.done"
grep "value prediction" "$LOG" || true
echo "=== pipeline_r5mini complete $(date -u)" | tee -a "$LOG"
