#!/bin/bash
# EqMotion + LocoVal end-to-end (reference main_eth_diverse.py): train a
# pose-less/vel-only valuenet on chip against the r4 policy, then train the
# EqMotion baseline on ETH-UCY-format exports with the EmLoco value loss and
# report the test-time filter metrics. Checkpoint-guarded / resumable.
set -u
RUN="python -m emloco_tpu.cli.run"
OUT=output/pipeline_r6
DATA=output/data
mkdir -p "$OUT"

if [ ! -e $DATA/ethucy_train.txt ]; then
  python scripts/make_ethucy_export.py --out-dir $DATA
fi

if [ ! -e $OUT/valuenet_00000299.ckpt ]; then
  # matched trajectory statistics: bank splined from the ETH train windows
  $RUN train-valuenet --config configs/pacer_terrain.yaml --nopose \
    --policy output/pipeline_r4/policy_00001099.ckpt \
    env.num_envs=1024 epochs=300 save_every=150 out_dir=$OUT \
    real_traj_pkl=$DATA/ethucy_bank.pkl traj.hybrid_init_prob=0.2 \
    >> $OUT/log.txt 2>&1
fi

if [ ! -e $OUT/eqmotion.ckpt ]; then
  # WTA training + test-time filter (reference valueloss_w default 0,
  # main_eth_diverse.py:87; train-time per-mode value pressure degenerates
  # the non-winning heads — see RESULTS.md r6_cpu section)
  $RUN train-eqmotion --valuenet $OUT/valuenet_00000299.ckpt \
    --valueloss-w 0 --threshold 0.1 epochs=60 --batch-size 64 out_dir=$OUT \
    ethucy=$DATA/ethucy_train.txt ethucy_val=$DATA/ethucy_test.txt \
    >> $OUT/eqmotion_log.txt 2>&1
fi
echo "chain_r9 done $(date -u)"
