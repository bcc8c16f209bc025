#!/bin/bash
# Real ETH-UCY leave-one-out evaluation (VERDICT r3 weak #3: "no claim
# about real ETH-UCY is yet supportable" — the prior numbers came from
# format-faithful synthetic exports). The reference mount ships the five
# scenes' annotation txts (EqMotion/ETH-UCY-Trajectory-Visualizer/
# datasets_visualize/*/test/*.txt, the standard biwi/crowds files); the
# standard protocol trains on four scenes and evaluates on the held-out
# fifth (reference main_eth_diverse.py --subset). Uses the raw-txt
# ingestion path (`train-eqmotion ethucy=…`, comma-lists build windows
# per scene) and the pipeline_r6 vel-only valuenet for the test-time
# LocoVal filter. Resumable: each fold is skipped if its eqmotion.ckpt
# exists.
set -u
RUN="python -m emloco_tpu.cli.run"
BASE=/root/reference/EqMotion/ETH-UCY-Trajectory-Visualizer/datasets_visualize
VNET=${EMLOCO_VNET:-output/pipeline_r6/valuenet_00000299.ckpt}
OUT=output/ethucy_loo

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
  $RUN train-eqmotion --valuenet $VNET --valueloss-w 0 --threshold 0.1 \
    epochs=60 --batch-size 64 out_dir=$dir \
    ethucy="$train" ethucy_val="${SCENES[$held]}" \
    > "$dir/log.txt" 2>&1 || { echo "=== fold $held FAILED rc=$?"; }
  tail -20 "$dir/log.txt" | grep -E "ade|fde|filter|wta" || true
done
echo "=== ethucy_loo complete $(date -u)"
