#!/bin/bash
# Advanced-sensor pipeline run (VERDICT weak #7: velocity-map / CNN / group
# obs existed only as unit tests + bench rates). Train a short policy with
# the velocity-map sensor + CNN encoder on chip so a variant config has an
# end-to-end learning curve, then eval it through the same player path as
# the flat-MLP runs.
set -u
RUN="python -m emloco_tpu.cli.run"

mkdir -p output/pipeline_r5
if [ ! -e output/pipeline_r5/policy_00000299.ckpt ]; then
  $RUN train-policy --config configs/pacer_terrain.yaml \
    env.velocity_map=true amp.network=sept_cnn \
    env.num_envs=1024 epochs=300 save_every=150 \
    out_dir=output/pipeline_r5 \
    >> output/pipeline_r5/log.txt 2>&1
fi
if [ ! -e output/pipeline_r5/eval.done ]; then
  $RUN eval-policy --config configs/pacer_terrain.yaml \
    env.velocity_map=true amp.network=sept_cnn env.num_envs=64 \
    --policy output/pipeline_r5/policy_00000299.ckpt --games 4 --plots \
    out_dir=output/pipeline_r5 \
    >> output/pipeline_r5/eval_log.txt 2>&1 \
  && touch output/pipeline_r5/eval.done
fi
echo "chain_r8 done $(date -u)"
