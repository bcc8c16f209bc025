#!/bin/bash
# Real ETH-UCY leave-one-out with the ARCHITECTURE-EXACT EqMotion port on
# the eth 20-mode interface (VERDICT r4 next-round #1). Protocol identical
# to scripts/ethucy_loo.sh (train four scenes, hold out the fifth,
# valueloss_w 0 matching the reference ETH-UCY default, LocoVal filter at
# test time); model swapped via --arch full, with the reference's
# per-subset channel width (main_eth_diverse.py:119-122: zara1 128 else
# 64). Resumable: a fold is skipped if its eqmotion.ckpt exists.
set -u
RUN="python -m emloco_tpu.cli.run"
BASE=/root/reference/EqMotion/ETH-UCY-Trajectory-Visualizer/datasets_visualize
VNET=${EMLOCO_VNET:-output/pipeline_r6/valuenet_00000299.ckpt}
OUT=output/ethucy_loo_full

declare -A SCENES=(
  [eth]="$BASE/eth/test/biwi_eth.txt"
  [hotel]="$BASE/hotel/test/biwi_hotel.txt"
  [univ]="$BASE/univ/test/students001.txt,$BASE/univ/test/students003.txt"
  [zara1]="$BASE/zara1/test/crowds_zara01.txt"
  [zara2]="$BASE/zara2/test/crowds_zara02.txt"
)

for held in eth hotel univ zara1 zara2; do
  dir=$OUT/$held
  [ -e "$dir/eqmotion.ckpt" ] && { echo "=== skip $held (done)"; continue; }
  mkdir -p "$dir"
  train=""
  for s in eth hotel univ zara1 zara2; do
    [ "$s" = "$held" ] && continue
    train="$train,${SCENES[$s]}"
  done
  train=${train#,}
  ch=64; [ "$held" = zara1 ] && ch=128
  echo "=== fold $held (channels $ch) $(date -u)"
  $RUN train-eqmotion --arch full --channels $ch \
    --valuenet $VNET --valueloss-w 0 --threshold 0.1 \
    epochs=60 --batch-size 64 out_dir=$dir \
    ethucy="$train" ethucy_val="${SCENES[$held]}" \
    > "$dir/log.txt" 2>&1 || { echo "=== fold $held FAILED rc=$?"; }
  tail -20 "$dir/log.txt" | grep -E "ade|fde|filter|wta" || true
done
echo "=== ethucy_loo_full complete $(date -u)"
