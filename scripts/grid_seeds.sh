#!/bin/bash
# Heading-cell variance study (VERDICT r4 weak #2 / next-round #6): the
# real+heading value-corr cell swung 0.349 (r17) vs 0.575 (r12) on single
# runs. Re-run the r17 policy+valuenet 4-condition grid at 3 eval seeds —
# same checkpoints, only the eval rollout rng/spawns/trajectories change —
# to separate seed variance from a genuine heading-alignment interaction.
# Resumable per seed.
set -u
RUN="python -m emloco_tpu.cli.run"
R17=output/pipeline_r17_group3k
GRP="env.group_obs=true env.hard_negative=true"   # r17 flag set
OUT=output/grid_seeds
mkdir -p "$OUT"

for seed in 0 7 13; do
  log=$OUT/seed$seed.log
  [ -e "$OUT/seed$seed.done" ] && { echo "=== skip seed $seed"; continue; }
  echo "=== grid seed $seed $(date -u)"
  $RUN eval-policy --config configs/pacer_terrain.yaml --grid \
    --policy $R17/policy_final.ckpt --valuenet $R17/valuenet_final.ckpt \
    --games 4 out_dir=$OUT env.num_envs=1024 seed=$seed $GRP \
    > "$log" 2>&1 && touch "$OUT/seed$seed.done" \
    || echo "=== seed $seed FAILED rc=$?"
  grep "value prediction" "$log" || true
done
echo "=== grid_seeds complete $(date -u)"
