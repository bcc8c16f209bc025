#!/bin/bash
# Group-obs / crowd-PointNet end-to-end run (VERDICT weak #7 tail): the
# group observation family (PointNet crowd encoder over neighbour states,
# group spawning) has unit tests and a bench rate but no committed learning
# curve. Train a policy with env.group_obs=true + eval with plots so the
# variant has an on-chip end-to-end story like velocity-map/CNN got in
# pipeline_r5. Reference capability: group obs in
# humanoid_pedestrain_terrain.py (people_obs) consumed by the sept builder.
set -u
OUT=output/pipeline_r13group
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
    sleep 30
  done
  echo "=== $header GAVE UP $(date -u)" >> "$LOG"
  return 1
}

phase "$OUT/policy_final.ckpt" "group-obs policy train" \
  bash -c "$RUN train-policy --config configs/pacer_terrain.yaml \
    out_dir=$OUT env.num_envs=1024 env.group_obs=true epochs=300 \
    save_every=150 \
  && cp \$(ls $OUT/policy_0*.ckpt | sort | tail -1) $OUT/policy_final.ckpt"

phase "$OUT/eval.done" "group-obs eval" \
  bash -c "$RUN eval-policy --config configs/pacer_terrain.yaml --plots \
    --policy $OUT/policy_final.ckpt --games 2 out_dir=$OUT \
    env.num_envs=256 env.group_obs=true \
  && touch $OUT/eval.done"

echo "=== chain_r13 complete $(date -u)" >> "$LOG"
