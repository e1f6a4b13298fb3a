#!/bin/bash
# Stacked best-achievable training step (VERDICT r5 item #2): gelu_approx +
# bf16 optimizer state (the ABBA winners, BASELINE.md "Optimizer state")
# + head_bf16 where it buys batch headroom, batch swept to the HBM limit.
# Phase 1 compile-only probes the compiler memory analysis for the large
# batches; phase 2 times the arms that fit, bracketed by batch-8 anchors.
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/best_step
mkdir -p "$OUT"
STEPS="${STEPS:-50}"
BASE="--gelu-approx --opt-state bf16"

probe() { # tag, args...
  tag=$1; shift
  echo "=== probe $tag ($(date +%T)) ===" | tee -a "$OUT/summary.log"
  timeout 2400 python scripts/profile_train.py --steps "$STEPS" $BASE "$@" \
    --compile-only > "$OUT/probe_$tag.log" 2>&1
  rc=$?
  grep -E "memory analysis|RESOURCE_EXHAUSTED|Out of memory" "$OUT/probe_$tag.log" \
    | head -3 | sed "s/^/[$tag] /" | tee -a "$OUT/summary.log"
  [ $rc -ne 0 ] && echo "[$tag] EXIT $rc" | tee -a "$OUT/summary.log"
}

run() { # tag, args...
  tag=$1; shift
  echo "=== run $tag ($(date +%T)) ===" | tee -a "$OUT/summary.log"
  timeout 3600 python scripts/profile_train.py --steps "$STEPS" $BASE "$@" \
    > "$OUT/run_$tag.log" 2>&1
  rc=$?
  grep -E "train step|MFU|memory analysis|compile " "$OUT/run_$tag.log" \
    | sed "s/^/[$tag] /" | tee -a "$OUT/summary.log"
  [ $rc -ne 0 ] && echo "[$tag] EXIT $rc" | tee -a "$OUT/summary.log"
}

probe b16 --batch 16
probe b16_hb --batch 16 --head-bf16
probe b24_hb --batch 24 --head-bf16
probe b32_hb_remat --batch 32 --head-bf16 --remat

run 01_b8 --batch 8
run 02_b12 --batch 12
run 03_b16 --batch 16
run 04_b16_hb --batch 16 --head-bf16
run 05_b8 --batch 8
echo "=== phase1 done $(date +%T) ===" | tee -a "$OUT/summary.log"
