#!/bin/bash
# Bounded-retry supervisor for flagship runs. The remote TPU compile service
# flaps (HTTP 500 / helper SIGTERM, VM restarts — docs/ROUND3_NOTES.md);
# each retry waits for the device to answer a trivial program, then resumes
# from the newest checkpoint in OUT.
#
# Usage: flagship_supervise.sh [RUNNER] [OUT]
#   RUNNER: script taking an optional resume-checkpoint arg
#           (default benchmarks/flagship_r4.sh)
#   OUT:    the run's output dir (default out/wsgc_gan_256_r4)
#
# ADVICE-r3 fixes:
# - checkpoint pick is by mtime (ls -t), not max iteration across lineages:
#   the newest-written checkpoint is the surviving lineage's frontier, while
#   a stale abandoned lineage can hold a higher iteration number.
# - deterministic trainer failures don't burn retries: a nonzero exit
#   WITHOUT an infra signature (signal death, or RPC/tunnel error patterns
#   in the log tail) aborts immediately instead of looping 6 times.
set -u
cd /root/repo
RUNNER=${1:-benchmarks/flagship_r4.sh}
OUT=${2:-out/wsgc_gan_256_r4}
for attempt in $(seq 1 6); do
  CKPT=$(ls -1t "$OUT"/itr_*.ckpt 2>/dev/null | head -1)
  echo "=== supervisor attempt $attempt $(date -u +%H:%M:%S) resume='${CKPT:-none}'" >> "$OUT.log"
  if [ -n "${CKPT:-}" ]; then
    "$RUNNER" "$CKPT"
  else
    "$RUNNER"
  fi
  rc=$?
  echo "=== trainer exit rc=$rc $(date -u +%H:%M:%S)" >> "$OUT.log"
  [ $rc -eq 0 ] && exit 0
  infra=0
  [ $rc -ge 128 ] && infra=1   # killed by a signal (SIGTERM/SIGKILL/OOM)
  if tail -40 "$OUT.log" | grep -qiE \
      'unavailable|deadline|connection (reset|refused)|socket closed|tunnel|INTERNAL:|RESOURCE_EXHAUSTED|failed to connect|heartbeat'; then
    infra=1
  fi
  if [ $infra -eq 0 ]; then
    echo "=== deterministic trainer failure (rc=$rc, no infra signature); aborting" >> "$OUT.log"
    exit $rc
  fi
  benchmarks/tpu_wait.sh /tmp/tpu_wait_flagship.log || exit 1
done
exit 1
