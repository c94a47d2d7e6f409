#!/bin/bash
# Bounded-retry supervisor for the round-3 flagship run. The remote TPU
# compile service flaps (HTTP 500 / helper SIGTERM, VM restarts — see
# docs/ROUND3_NOTES.md); each retry waits for the device to answer a
# trivial program, then resumes from the newest checkpoint in OUT.
set -u
cd /root/repo
OUT=out/wsgc_gan_256_r3b
for attempt in $(seq 1 6); do
  # sort -V: itr_15000 must beat itr_9000 (field-2 numeric sort was wrong —
  # underscores in OUT made field 2 non-numeric, falling back to lexicographic,
  # which resumed attempt 3 from itr_9000 instead of itr_15000).
  CKPT=$(ls -1 "$OUT"/itr_*.ckpt 2>/dev/null | sort -V | tail -1)
  echo "=== supervisor attempt $attempt $(date -u +%H:%M:%S) resume='${CKPT:-none}'" >> "$OUT.log"
  if [ -n "${CKPT:-}" ]; then
    benchmarks/flagship_r3.sh "$CKPT"
  else
    benchmarks/flagship_r3.sh
  fi
  rc=$?
  echo "=== trainer exit rc=$rc $(date -u +%H:%M:%S)" >> "$OUT.log"
  [ $rc -eq 0 ] && exit 0
  benchmarks/tpu_wait.sh /tmp/tpu_wait_flagship.log || exit 1
done
exit 1
