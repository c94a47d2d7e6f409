#!/bin/bash
# Time-boxed round-5 sweep: the two highest-value arms of
# basin_sweep_r5.sh (full 4-arm script kept for reruns with more budget).
#   chain_nostuff_s0  — the missing nostuff x nested-chain cell, seed 0
#   chain_nostuff_eps — same + --converse_epsilon 0.05 (BEYOND-REFERENCE
#                       epsilon-exploration intervention)
# Gate: scripts/converse_table.py exit status == #wrong relations.
set -u -o pipefail
cd /root/repo
COMMON="--dataset packed_coco --dataroot datasets/synth4k_chain --coco_val_split hash
  --skip_generation 1 --batch_size 64 --num_iterations 4000
  --image_size 256,256 --num_val_samples 256 --min_objects 3
  --learned_converse 1 --learned_transitivity 1
  --print_every 1000 --checkpoint_every 2000 --continue_on_error 1"
run() {
  name=$1; shift
  echo "=== arm $name: $* $(date -u +%H:%M:%S)"
  timeout 2400 python -m scripts.train $COMMON "$@" \
    --output_dir "out/basin_$name" 2>&1 | grep -v "^t = " | tail -20
  rc=${PIPESTATUS[0]}
  [ "$rc" -ne 0 ] && echo "=== arm $name FAILED rc=$rc"
  ck=$(ls -t out/basin_$name/itr_*.ckpt 2>/dev/null | head -1)
  if [ -n "$ck" ]; then
    python -m scripts.converse_table "$ck"
    echo "=== arm $name: $((6 - $?))/6 correct"
  fi
}
run chain_nostuff_s0 --seed 0 --stuff_whitelist ""
run chain_nostuff_eps --seed 0 --stuff_whitelist "" --converse_epsilon 0.05
