#!/bin/bash
# Round-5 final-session chain: rebuild the valuenet prerequisites (the
# gitignored .ckpt artifacts do not survive between driver sessions) and
# run the WTA-gated EmLoco loss across the full real ETH-UCY leave-one-out
# (upgrades the r5 zara1 existence result to the full protocol).
#   phase 1: 300-epoch flat policy @1,600 envs (r5mini recipe, ~15 min)
#   phase 2: vel-only (--nopose) valuenet vs that policy with the ETH-UCY
#            spline bank (chain_r9 recipe; the prediction-side loss feeds
#            the net velocity-only inputs, so train it pose-less)
#   phase 3: scripts/ethucy_loo_wta.sh with EMLOCO_VNET pointed here
# Resumable per phase; retries absorb transient tunnel/TPU errors.
set -u
RUN="python -m emloco_tpu.cli.run"
OUT=output/chain_wta
DATA=output/data
LOG=$OUT/log.txt
mkdir -p "$OUT"

phase() {
  local artifact=$1 header=$2; shift 2
  [ -e "$artifact" ] && { echo "=== skip $header" | tee -a "$LOG"; return 0; }
  for attempt in 1 2 3; do
    echo "=== $header (attempt $attempt) $(date -u)" | tee -a "$LOG"
    "$@" >> "$LOG" 2>&1 && [ -e "$artifact" ] && return 0
    echo "=== $header failed rc=$? $(date -u)" | tee -a "$LOG"; sleep 30
  done
  return 1
}

phase "$OUT/policy_00000299.ckpt" "policy 300ep @1600" \
  $RUN train-policy --config configs/pacer_terrain.yaml out_dir=$OUT \
    env.num_envs=1600 env.hard_negative=true epochs=300 save_every=150 \
  || exit 1

phase "$OUT/valuenet_00000299.ckpt" "vel-only valuenet 300ep" \
  $RUN train-valuenet --config configs/pacer_terrain.yaml --nopose \
    --policy $OUT/policy_00000299.ckpt \
    env.num_envs=1024 epochs=300 save_every=150 out_dir=$OUT \
    real_traj_pkl=$DATA/ethucy_bank.pkl traj.hybrid_init_prob=0.2 \
  || exit 1

EMLOCO_VNET=$OUT/valuenet_00000299.ckpt bash scripts/ethucy_loo_wta.sh
echo "=== chain_wta complete $(date -u)" | tee -a "$LOG"
