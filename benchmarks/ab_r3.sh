#!/bin/bash
# Round-3 per-change A/B harness (VERDICT r2 task 1 / ROUND2_NOTES re-land
# policy): each session-5 primitive re-measured ONE change at a time on the
# same host/day, full GAN step, 256^2 batch 16. Sequential — one chip.
#
# HISTORICAL: results in docs/logs/ab_r3.log (baseline 81.42, bsn 81.29
# neutral, vggpool 79.27 loses). The BENCH_BSN / BENCH_VGG_POOL gates were
# removed afterwards and the primitives demoted to
# benchmarks/candidate_layers.py — re-running this script now measures the
# baseline four times. To re-A/B, re-wire a gate from candidate_layers first.
set -u
cd /root/repo
LOG=${1:-docs/logs/ab_r3.log}
mkdir -p "$(dirname "$LOG")"
run() {
  local name=$1; shift
  echo "=== $name $(date -u +%H:%M:%S) env: $*" >> "$LOG"
  env "$@" timeout 3600 python bench.py >> "$LOG" 2>&1
  echo "=== $name done $(date -u +%H:%M:%S) rc=$?" >> "$LOG"
}
run baseline BENCH_STEPS=20
run bsn      BENCH_STEPS=20 BENCH_BSN=1
run vggpool  BENCH_STEPS=20 BENCH_VGG_POOL=1
run combo    BENCH_STEPS=20 BENCH_BSN=1 BENCH_VGG_POOL=1
echo "ALL DONE $(date -u +%H:%M:%S)" >> "$LOG"
