#!/bin/bash
# Round-4 flagship: the 3,000-epoch GROUP-OBS chain (VERDICT r3 item 9 —
# closes the r16 thread: corr 0.45+ only appears at 3k-epoch policy
# maturity, and the crowd-enabled config has never been run there), with
# hard-negative motion sampling live (VERDICT r3 item 4 wiring) and the
# round-4 reference-exact obs layout (no phantom root-height slot, AMP disc
# without root height, limb-weight obs off — PARITY.md "layout decisions").
#
# Phases: 3k-epoch group policy -> 600-epoch LocoVal valuenet -> eval grid
# (value corr is the headline number; reference compute_group_observation,
# humanoid_pedestrain_terrain.py:1613-1666).
set -u
OUT=output/pipeline_r17_group3k
LOG=$OUT/log.txt
mkdir -p "$OUT"
RUN="python -m emloco_tpu.cli.run"
GRP="env.group_obs=true env.hard_negative=true"

train_resumable() {  # train_resumable <final> <prefix> <total_epochs> <save_every> <cmd...>
  local final=$1 prefix=$2 total=$3 save=$4; shift 4
  [ -e "$final" ] && { echo "=== skip $prefix (exists)" >> "$LOG"; return 0; }
  for attempt in 1 2 3 4; do
    local latest epochs res=""
    latest=$(ls "$OUT/${prefix}"_0*.ckpt 2>/dev/null | sort | tail -1)
    epochs=$total
    if [ -n "$latest" ]; then
      local n
      n=$((10#$(basename "$latest" .ckpt | awk -F_ '{print $NF}')))
      epochs=$((total - n - 1))
      res="--resume $latest"
      echo "=== $prefix resume from $latest, $epochs epochs left $(date -u)" >> "$LOG"
    fi
    if [ "$epochs" -le 0 ]; then
      cp "$latest" "$final"; return 0
    fi
    echo "=== $prefix (attempt $attempt, epochs=$epochs) $(date -u)" >> "$LOG"
    if "$@" epochs=$epochs save_every=$save $res >> "$LOG" 2>&1; then
      cp "$(ls "$OUT/${prefix}"_0*.ckpt | sort | tail -1)" "$final"
      return 0
    fi
    echo "=== $prefix attempt $attempt failed rc=$? $(date -u)" >> "$LOG"
    sleep 60
  done
  echo "=== $prefix GAVE UP $(date -u)" >> "$LOG"
  return 1
}

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

# 1. 3k-epoch group-obs pretrain, hard negatives live
train_resumable "$OUT/policy_final.ckpt" policy 3000 250 \
  $RUN train-policy --config configs/pacer_terrain.yaml out_dir=$OUT \
    env.num_envs=1024 $GRP

# 2. LocoVal valuenet against the mature group policy
train_resumable "$OUT/valuenet_final.ckpt" valuenet 600 300 \
  $RUN train-valuenet --config configs/pacer_terrain.yaml \
    --policy $OUT/policy_final.ckpt out_dir=$OUT env.num_envs=1024 $GRP

# 3. eval grid: value corr with crowds enabled is the headline
phase "$OUT/eval_grid.done" "eval grid" \
  bash -c "$RUN eval-policy --config configs/pacer_terrain.yaml --grid --plots \
    --policy $OUT/policy_final.ckpt --valuenet $OUT/valuenet_final.ckpt \
    --games 4 out_dir=$OUT env.num_envs=1024 $GRP \
  && touch $OUT/eval_grid.done"

echo "=== chain_r17_group3k complete $(date -u)" >> "$LOG"
