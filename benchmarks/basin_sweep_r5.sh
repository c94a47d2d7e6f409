#!/bin/bash
# Round-5 converse basin sweep (VERDICT r4 task 3): run the cell the r4
# sweep stopped short of, plus one clearly-labeled beyond-reference
# intervention.
#
# r4's two findings (docs/RESULTS.md "Basin-boundary sweep"):
#   (a) nostuff (stuff_whitelist "") recovers all four spatial rows in every
#       arm tested — sky/grass's vertical bias was the spatial-row breaker;
#   (b) nested-chain data (50% concentric-chain scenes, datasets/synth4k_chain)
#       raises true nesting anchors to 2nd place.
# The 6/6 candidate — nostuff x nested-chain — was never run. Arms here:
#   chain_nostuff_s{0,1,2} : the missing cell, seeds 0-2
#   chain_nostuff_eps_s0   : + --converse_epsilon 0.05 — BEYOND-REFERENCE
#       intervention: epsilon-exploration in the dataset-side converse
#       sampler, breaking REINFORCE basin lock-in by keeping every converse
#       candidate sampled with probability >= eps/K. The reference's sampler
#       (scripts/graphs_utils.py) is pure exploitation; epsilon=0 reproduces
#       it bit-for-bit.
# Layout stage, 4000 steps, batch 64, ~8 min/arm on the v5e.
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
    --output_dir "out/basin_$name" 2>&1 | grep -v "^t = " | tail -25
  rc=${PIPESTATUS[0]}
  [ "$rc" -ne 0 ] && echo "=== arm $name FAILED rc=$rc"
  ck=$(ls -t out/basin_$name/itr_*.ckpt 2>/dev/null | head -1)
  if [ -n "$ck" ]; then
    python -m scripts.converse_table "$ck"
    echo "=== arm $name: $((6 - $?))/6 correct"
  fi
}
run chain_nostuff_s0 --seed 0 --stuff_whitelist ""
run chain_nostuff_s1 --seed 1 --stuff_whitelist ""
run chain_nostuff_s2 --seed 2 --stuff_whitelist ""
run chain_nostuff_eps_s0 --seed 0 --stuff_whitelist "" --converse_epsilon 0.05
