#!/bin/bash
# Poll the TPU tunnel until a trivial device program completes, then exit 0.
# Used to detect recovery from a hung/restarted remote TPU service.
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_wait.log}
for i in $(seq 1 240); do
  if timeout 75 python - <<'EOF' >> "$LOG" 2>&1
from canonicalsg2im_tpu.utils.platform import apply_platform_override
apply_platform_override()
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print("ok", float((x @ x).sum()))
EOF
  then
    echo "TPU BACK $(date -u +%H:%M:%S) after $i probes" >> "$LOG"
    exit 0
  fi
  echo "probe $i failed $(date -u +%H:%M:%S)" >> "$LOG"
  sleep 45
done
echo "TPU NEVER RECOVERED $(date -u +%H:%M:%S)" >> "$LOG"
exit 1
