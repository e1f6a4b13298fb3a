#!/bin/bash
# Same-session ABBA of the packed single-array host fetch (VERDICT r5 #5):
# OLD = pre-packing HEAD (worktree at /tmp/wt_prepack), NEW = working tree.
# Relay wall times swing with load, so arms are interleaved old,new,new,old
# back-to-back in one session. Fetch accounting (NEW arms) is deterministic.
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/stress_fetch_ab
mkdir -p "$OUT"
KF="${KF:-200}"

run() { # tag, dir
  tag=$1; dir=$2
  echo "=== run $tag ($(date +%T)) ===" | tee -a "$OUT/summary.log"
  (cd "$dir" && timeout 3000 python scripts/stress_long_run.py \
      --keyframes "$KF" --out "/tmp/stress_$tag") > "$OUT/run_$tag.log" 2>&1
  rc=$?
  grep -E "keyframes in|host syncs|loop edges|s/kf avg" "$OUT/run_$tag.log" \
    | sed "s/^/[$tag] /" | tee -a "$OUT/summary.log"
  [ $rc -ne 0 ] && echo "[$tag] EXIT $rc" | tee -a "$OUT/summary.log"
}

run 01_old /tmp/wt_prepack
run 02_new .
run 03_new .
run 04_old /tmp/wt_prepack
echo "=== done $(date +%T) ===" | tee -a "$OUT/summary.log"
