#!/bin/bash
# Rerun the getup + self-contact sanity train (VERDICT item 6 validation)
# with the actuator-saturation + PPO-ratio-guard fixes in place. The two
# pre-fix attempts (pipeline_r4c, r4c2) diverged to NaN within 10 epochs:
# fallen poses with theta~pi at kp<=1000 commanded multi-kNm drive torques,
# the power penalty hit tens of kW, and one epoch's mini-updates pushed
# exp(dlogp) past f32 range. The CPU NaN-hunt at the same config stayed
# finite for 11+ epochs with the fixes.
set -u
RUN="python -m emloco_tpu.cli.run"

mkdir -p output/pipeline_r4c3
if [ ! -e output/pipeline_r4c3/policy_00000299.ckpt ]; then
  $RUN train-policy --config configs/pacer_terrain.yaml \
    task=getup engine.self_contact=true env.num_envs=1024 \
    env.getup_update_epoch=100 epochs=300 save_every=150 \
    out_dir=output/pipeline_r4c3 \
    >> output/pipeline_r4c3/log.txt 2>&1
fi
echo "chain_r7 done $(date -u)"
