#!/bin/bash
# Run the hard-negative comparison eval after the main chain frees the chip.
set -u
CHAIN_PID=${1:?usage: chain_r4d.sh <chain_r4_pid>}
while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 60; done
bash scripts/pipeline_r4d.sh
