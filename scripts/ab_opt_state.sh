#!/bin/bash
# Paired ABBA sweep of the Adam moment-storage knob on the real chip
# (VERDICT r4 item #1). Each arm is one profile_train.py process; arms are
# interleaved fp32,X,X,fp32 per candidate so every candidate is sandwiched
# by fresh fp32 anchors in the same session. Loss trajectories from the
# first (untimed) 50-step scan of each run land next to the logs for the
# trajectory-identity comparison.
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/optstate_ab
mkdir -p "$OUT"
BATCH="${BATCH:-8}"
STEPS="${STEPS:-50}"
EXTRA="${EXTRA:---gelu-approx}"
i=0
for arm in fp32 bf16 bf16 fp32 int8 int8 fp32 bf16_fused bf16_fused fp32 int8_fused int8_fused fp32; do
  i=$((i+1))
  tag=$(printf "%02d_%s" "$i" "$arm")
  echo "=== run $tag ($(date +%T)) ===" | tee -a "$OUT/summary.log"
  timeout 3600 python scripts/profile_train.py --batch "$BATCH" --steps "$STEPS" \
    $EXTRA --opt-state "$arm" --save-losses "$OUT/losses_$tag.npy" \
    > "$OUT/run_$tag.log" 2>&1
  rc=$?
  grep -E "train step|MFU|memory analysis|compile " "$OUT/run_$tag.log" \
    | sed "s/^/[$tag] /" | tee -a "$OUT/summary.log"
  [ $rc -ne 0 ] && echo "[$tag] EXIT $rc" | tee -a "$OUT/summary.log"
done
echo "=== done $(date +%T) ===" | tee -a "$OUT/summary.log"
