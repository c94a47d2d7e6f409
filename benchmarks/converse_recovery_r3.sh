#!/bin/bash
# Six-relation converse-recovery arms (round-3 task 8).
#
# The r3b flagship showed the WSGC REINFORCE objective is bistable for the
# left/right and inside/surrounding rows: the symmetrized weight matrix
# (get_conv_converse, sg2im/model.py:8-15) ties W[left,surrounding] =
# W[surrounding,left], and with max_objects=10 / nested_fraction=0.25 the
# sampled-converse usage of "surrounding" outweighs its true nested usage
# ~3:1 from step 0, so an early noise push can lock the wrong equilibrium.
# These arms raise the true-anchor ratio legitimately (more nesting, fewer
# horizontal chain edges per scene) and vary the seed; layout-only stage,
# ~6 min/arm on the v5e.
set -u -o pipefail  # ADVICE r3: a crashed/timed-out arm must not read as ok
cd /root/repo
COMMON="--dataset packed_clevr_syn --skip_generation 1 --batch_size 64
  --image_size 64,64 --num_train_samples 2048 --num_val_samples 128
  --min_objects 3 --learned_converse 1 --learned_transitivity 1
  --num_iterations 3000 --checkpoint_every 1000 --print_every 500"
run() {
  name=$1; shift
  echo "=== arm $name: $* $(date -u +%H:%M:%S)"
  timeout 1500 python -m scripts.train $COMMON "$@" \
    --output_dir "out/conv_rec_$name" 2>&1 | grep -v "^t = " | tail -40
  rc=${PIPESTATUS[0]}
  [ "$rc" -ne 0 ] && echo "=== arm $name FAILED rc=$rc"
}
run a --syn_nested_fraction 1.0 --max_objects 6 --seed 0
run b --syn_nested_fraction 0.5 --max_objects 10 --seed 0
run c --syn_nested_fraction 1.0 --max_objects 6 --seed 7
