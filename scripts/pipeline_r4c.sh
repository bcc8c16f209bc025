#!/bin/bash
# Pipeline r4 follow-on: GETUP task sanity run with intra-humanoid
# self-contact enabled (reference: PhysX self-collision asset options feeding
# humanoid_pedestrain_terrain_getup.py). Short full-scale training — the
# check is that fall-bank episodes train stably with limbs colliding against
# the trunk (no NaN recycling spike, recovery terminations gate correctly)
# and the curriculum schedule moves the traced fall-init probability.
set -u
OUT=output/pipeline_r4c
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

phase "$OUT/policy_00000299.ckpt" "getup + self-contact sanity train" \
  python -m emloco_tpu.cli.run train-policy --config configs/pacer_terrain.yaml \
    task=getup engine.self_contact=true env.num_envs=1024 \
    env.getup_update_epoch=100 epochs=300 save_every=150 out_dir=$OUT

echo "=== pipeline_r4c complete $(date -u)" >> "$LOG"
