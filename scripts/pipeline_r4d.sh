#!/bin/bash
# Hard-negative efficacy comparison (VERDICT item 5): the r3 filter eval ran
# the r1-trained predictor against the r3 valuenet (no negatives) on
# synthetic scenes — value-pick ADE 3.09 vs oracle 1.78 vs random 4.29.
# Re-run the IDENTICAL eval with the r4 valuenet (heading-inversion
# negatives at prob 0.5) so the only changed variable is the value function.
set -u
OUT=output/pipeline_r4d
LOG=$OUT/log.txt
mkdir -p "$OUT"

phase() {
  local artifact=$1 header=$2; shift 2
  if [ -e "$artifact" ]; then
    echo "=== skip $header (exists: $artifact)" >> "$LOG"
    return 0
  fi
  for attempt in 1 2 3; do
    echo "=== $header (attempt $attempt) $(date -u)" >> "$LOG"
    "$@" >> "$LOG" 2>&1 && [ -e "$artifact" ] && return 0
    echo "=== $header attempt $attempt failed rc=$? $(date -u)" >> "$LOG"
    sleep 60
  done
  echo "=== $header GAVE UP $(date -u)" >> "$LOG"
  return 1
}

phase "$OUT/eval_filter.done" "filter eval: r1 predictor x r4 valuenet (synthetic)" \
  bash -c "python -m emloco_tpu.cli.run eval-predictor \
    --config configs/jta_predictor.yaml \
    --predictor output/pipeline_r1/predictor_best.ckpt \
    --valuenet output/pipeline_r4/valuenet_00000399.ckpt \
    --batch-size 10 --batches 20 out_dir=$OUT \
  && touch $OUT/eval_filter.done"

echo "=== pipeline_r4d complete $(date -u)" >> "$LOG"
