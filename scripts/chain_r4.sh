#!/bin/bash
# Serialize chip work behind pipeline_r4: real-data-path predictor run,
# getup+self-contact sanity, then the profile/MFU bench breakdown. One chip
# through the axon tunnel — phases must not overlap.
set -u
R4_PID=${1:?usage: chain_r4.sh <pipeline_r4_pid>}
while kill -0 "$R4_PID" 2>/dev/null; do sleep 60; done
bash scripts/pipeline_r4b.sh
bash scripts/pipeline_r4c.sh
python bench.py --breakdown > output/bench_breakdown_r2.json 2> output/bench_breakdown_r2.err
echo "chain_r4 done $(date -u)" >> output/pipeline_r4/log.txt
