#!/bin/bash
# WTA-gated EmLoco loss on the full real ETH-UCY leave-one-out (round 5).
# The r5 zara1 probe (RESULTS.md "WTA-gated EmLoco loss") showed the
# gated penalty improves a real-data fold where the all-modes form
# degenerates (reference ships valueloss_w=0 for ETH-UCY,
# main_eth_diverse.py defaults). This runs the SAME protocol as
# scripts/ethucy_loo.sh (compact arch, train four scenes / hold out the
# fifth, pipeline_r6 valuenet for both loss and test-time filter) with
# --valueloss-w 0.1 --value-loss-mode wta, so every fold has its
# committed w=0 baseline (RESULTS.md r4 LOO table, avg 0.245/0.430).
# Resumable: a fold is skipped if its eqmotion.ckpt exists.
set -u
RUN="python -m emloco_tpu.cli.run"
BASE=/root/reference/EqMotion/ETH-UCY-Trajectory-Visualizer/datasets_visualize
VNET=${EMLOCO_VNET:-output/pipeline_r6/valuenet_00000299.ckpt}
OUT=output/ethucy_loo_wta

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
  echo "=== fold $held $(date -u)"
  $RUN train-eqmotion --valuenet $VNET --valueloss-w 0.1 \
    --value-loss-mode wta --threshold 0.1 \
    epochs=60 --batch-size 64 out_dir=$dir \
    ethucy="$train" ethucy_val="${SCENES[$held]}" \
    > "$dir/log.txt" 2>&1 || { echo "=== fold $held FAILED rc=$?"; }
  tail -20 "$dir/log.txt" | grep -E "ade|fde|filter|wta" || true
done
echo "=== ethucy_loo_wta complete $(date -u)"
