#!/bin/bash
# Remaining chip queue after chain_r7/r8 (run by chip_watch.sh):
# r9 EqMotion+LocoVal at full scale, r10 predictor noise A/B, then the
# bench breakdown refresh.
set -u
cd /root/repo
bash scripts/chain_r9.sh
bash scripts/chain_r10.sh
python bench.py --breakdown > output/bench_breakdown_r3.json 2> output/bench_breakdown_r3.err
python bench.py > output/bench_r3.json 2> output/bench_r3.err
echo "chip_followup done $(date -u)"
