#!/bin/bash
# Converse basin-boundary sweep (VERDICT r3 task 1c): which ingredient of
# the data mix selects the wrong nesting<->vertical equilibrium?
#
# Three runs so far land the same wrong-basin family (r3b GAN flagship;
# the reference's own torch REINFORCE on CPU, docs/logs/ref_converse_seed0.log;
# the r4 packed_coco layout arm, docs/logs/conv_rec_r4_resume.log:
# inside->above 0.959, surrounding->above 0.977). Hypothesis: the sky/grass
# stuff regions dominate __surrounding__ usage and are vertically biased
# (sky is above almost everything it surrounds), making "above" a
# loss-reducing converse for nesting relations. Arms:
#   nostuff : stuff_whitelist "" — containment triplets only from the
#             generator's unbiased nested instance pairs
#   seed1/2 : full mix, different seeds — basin stability vs init noise
#   lowlr   : canonical_lr 1e-3 — delayed commitment (lock-in timing test)
#
# Layout stage, 4000 steps, ~8 min/arm on the v5e with rendering disabled.
set -u -o pipefail
cd /root/repo
COMMON="--dataset packed_coco --dataroot datasets/synth16k --coco_val_split hash
  --skip_generation 1 --batch_size 64 --num_iterations 4000
  --image_size 256,256 --num_val_samples 256 --min_objects 3
  --learned_converse 1 --learned_transitivity 1
  --print_every 1000 --checkpoint_every 2000 --continue_on_error 1"
run() {
  name=$1; shift
  echo "=== arm $name: $* $(date -u +%H:%M:%S)"
  timeout 2400 python -m scripts.train $COMMON "$@" \
    --output_dir "out/basin_$name" 2>&1 | grep -v "^t = " | tail -30
  rc=${PIPESTATUS[0]}
  [ "$rc" -ne 0 ] && echo "=== arm $name FAILED rc=$rc"
}
run nostuff --stuff_whitelist "" --seed 0
run seed1 --seed 1
run seed2 --seed 2
run lowlr --canonical_learning_rate 0.001 --seed 0
