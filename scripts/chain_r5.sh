#!/bin/bash
# Round-2 chip chain, relaunched after fixing the dropped ndjson= override
# (load_config silently discarded it, so the "real-data" predictor phases ran
# on SyntheticScenes) and the predictor compile-time fixes. One chip through
# the axon tunnel — phases must not overlap.
set -u
bash scripts/pipeline_r4b.sh
bash scripts/pipeline_r4c.sh
python bench.py --breakdown > output/bench_breakdown_r2.json 2> output/bench_breakdown_r2.err
bash scripts/pipeline_r4d.sh
echo "chain_r5 done $(date -u)" >> output/pipeline_r4/log.txt
