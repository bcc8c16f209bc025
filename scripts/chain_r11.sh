#!/bin/bash
# Getup + self-contact redo (VERDICT item 6 validation, attempt 3).
# pipeline_r4c3 NaNed its params by epoch ~10: one pathological minibatch's
# gradients went nonfinite and global-norm clipping propagated the NaN into
# the weights. Since then: nonfinite minibatch updates are skipped (visible
# as a nonfinite_grad rate), the divergence recycler also checks
# joint_rot/body caches, and the epoch's first observation is sanitized.
set -u
RUN="python -m emloco_tpu.cli.run"

mkdir -p output/pipeline_r4c4
if [ ! -e output/pipeline_r4c4/policy_00000299.ckpt ]; then
  $RUN train-policy --config configs/pacer_terrain.yaml \
    task=getup engine.self_contact=true env.num_envs=1024 \
    env.getup_update_epoch=100 epochs=300 save_every=150 \
    out_dir=output/pipeline_r4c4 \
    >> output/pipeline_r4c4/log.txt 2>&1
fi
echo "chain_r11 done $(date -u)"
