#!/bin/bash
# Wait for the axon TPU tunnel to come back (transient backend errors are
# known to kill it for stretches), then run the two pending chip pipelines:
# chain_r7 (getup + self-contact sanity train) and chain_r8 (velocity-map +
# CNN-encoder variant train/eval). Both scripts are checkpoint-guarded, so
# re-running after a mid-flight tunnel death resumes instead of restarting.
set -u
cd /root/repo
for i in $(seq 1 200); do
  if timeout 420 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; then
    echo "chip up after probe $i $(date -u)"
    break
  fi
  echo "probe $i: chip down $(date -u)"
  sleep 120
done
bash scripts/chain_r7.sh
bash scripts/chain_r8.sh
echo "chip_watch done $(date -u)"
