#!/bin/bash
# Group-obs quality A/B (VERDICT r2 weak #3): pipeline_r13group's task-value
# corr 0.304 (vs 0.45-0.71 for the flat r12 config) is unexplained — the
# r13group policy had a 300-epoch budget while the flat baseline had 3,000.
# Isolate policy-maturity from the crowd-obs pathway:
#   A. flat config at the SAME 300-epoch/1,024-env budget -> eval corr
#   B. group-obs config extended to 1,000 epochs (resumes r13group) -> eval
# If A ~= 0.3 the 300-epoch budget explains it; if A is high and B stays
# low, the crowd pathway is implicated (reference compute_group_observation,
# humanoid_pedestrain_terrain.py:1613-1666).
set -u
OUTA=output/pipeline_r16_flat300
OUTB=output/pipeline_r13group
LOG=output/pipeline_r16_flat300/log.txt
mkdir -p "$OUTA"
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

# A. flat config, identical budget to the original group run
phase "$OUTA/policy_final.ckpt" "flat policy 300ep (A)" \
  bash -c "$RUN train-policy --config configs/pacer_terrain.yaml \
    out_dir=$OUTA env.num_envs=1024 epochs=300 save_every=150 \
  && cp \$(ls $OUTA/policy_0*.ckpt | sort | tail -1) $OUTA/policy_final.ckpt"

phase "$OUTA/eval.done" "flat 300ep eval (A)" \
  bash -c "$RUN eval-policy --config configs/pacer_terrain.yaml --plots \
    --policy $OUTA/policy_final.ckpt --games 2 out_dir=$OUTA \
    env.num_envs=256 \
  && touch $OUTA/eval.done"

# B. group-obs config extended to 1,000 epochs (absolute ckpt numbering
# resumes from the r13group 300-epoch run)
phase "$OUTB/policy_final_1000.ckpt" "group policy to 1000ep (B)" \
  bash -c "latest=\$(ls $OUTB/policy_0*.ckpt | sort | tail -1); \
    n=\$((10#\$(basename \$latest .ckpt | awk -F_ '{print \$NF}'))); \
    $RUN train-policy --config configs/pacer_terrain.yaml \
      out_dir=$OUTB env.num_envs=1024 env.group_obs=true \
      epochs=\$((1000 - n - 1)) save_every=250 --resume \$latest \
  && cp \$(ls $OUTB/policy_0*.ckpt | sort | tail -1) \
      $OUTB/policy_final_1000.ckpt"

phase "$OUTB/eval_1000.done" "group 1000ep eval (B)" \
  bash -c "$RUN eval-policy --config configs/pacer_terrain.yaml --plots \
    --policy $OUTB/policy_final_1000.ckpt --games 2 out_dir=$OUTB \
    env.num_envs=256 env.group_obs=true \
  && touch $OUTB/eval_1000.done"

echo "=== chain_r16_ab complete $(date -u)" >> "$LOG"
