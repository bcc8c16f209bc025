#!/bin/bash
# Post-fix chip work, serialized: (1) hard-negative efficacy comparison —
# the SAME r4b predictor and ndjson test split evaluated with the r3 valuenet
# (trained WITHOUT heading-inversion negatives) for a clean A/B against the
# r4b eval (r4 valuenet, value-pick ADE 2.88); (2) rerun the getup +
# self-contact sanity train with the fall-bank anchoring fix.
set -u
RUN="python -m emloco_tpu.cli.run"
DATA=output/data

mkdir -p output/pipeline_r4d
if [ ! -e output/pipeline_r4d/eval_filter.done ]; then
  $RUN eval-predictor --config configs/jta_predictor.yaml \
    --predictor output/pipeline_r4b/predictor_best.ckpt \
    --valuenet output/pipeline_r3/valuenet_00000399.ckpt \
    --batch-size 16 --batches 30 out_dir=output/pipeline_r4d \
    ndjson=$DATA/jta_synth_train.ndjson ndjson_val=$DATA/jta_synth_test.ndjson \
    >> output/pipeline_r4d/log.txt 2>&1 \
  && touch output/pipeline_r4d/eval_filter.done
fi

mkdir -p output/pipeline_r4c2
if [ ! -e output/pipeline_r4c2/policy_00000299.ckpt ]; then
  $RUN train-policy --config configs/pacer_terrain.yaml \
    task=getup engine.self_contact=true env.num_envs=1024 \
    env.getup_update_epoch=100 epochs=300 save_every=150 \
    out_dir=output/pipeline_r4c2 \
    >> output/pipeline_r4c2_log.txt 2>&1
fi
echo "chain_r6 done $(date -u)"
