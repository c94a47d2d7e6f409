#!/bin/bash
# Round-3 kill-gap chip work: run while the flagship (out/wsgc_gan_256_r3b)
# is stopped at its itr_10000 checkpoint, before resuming it.
#   1. Fresh post-demotion per-op profile (PERF.md task-1 floor evidence).
#   2. One XLA-flag probe: scoped VMEM limit raise (new compile, ~13 min).
set -u
cd /root/repo
LOG=${1:-docs/logs/gap_r3.log}
mkdir -p "$(dirname "$LOG")"
stamp() { echo "=== $1 $(date -u +%H:%M:%S)" >> "$LOG"; }

stamp "profile (post-demotion per-op table)"
PROF_TOP=40 timeout 2400 python -m scripts.profile_gan_step >> "$LOG" 2>&1
stamp "profile done rc=$?"

stamp "bench baseline recheck (cache-hit)"
BENCH_STEPS=20 timeout 2400 python bench.py >> "$LOG" 2>&1
stamp "baseline done rc=$?"

stamp "bench vmem=65536KiB (new compile)"
XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
LIBTPU_INIT_ARGS="--xla_tpu_scoped_vmem_limit_kib=65536" BENCH_STEPS=20 \
  timeout 3600 python bench.py >> "$LOG" 2>&1
stamp "vmem done rc=$?"

echo "GAP DONE $(date -u +%H:%M:%S)" >> "$LOG"
