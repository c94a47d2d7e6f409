#!/bin/bash
# Round-4 converse-recovery arm (VERDICT r3 task 1a): finish the killed
# packed_coco layout-stage arm on the on-disk synthetic-COCO mix, at full
# length. Round 2's config-2 recovered __surrounding__->__inside__ at
# p=0.886 on this distribution; datasets/synth16k regenerates it at 16k
# images with nested_fraction 0.25 (strict containment pairs) on top of the
# stuff-region containment COCO already provides. The full-GAN leg of task
# 1a is the r4 flagship itself (flagship_r4.sh: same dataset, same
# learned_converse/transitivity flags, 256^2 adversarial objective).
#
# Usage: converse_recovery_r4.sh [SEED] [STEPS] [OUT]
set -u -o pipefail
cd /root/repo
SEED=${1:-0}
STEPS=${2:-4000}
OUT=${3:-out/conv_rec_coco_r4}
timeout 5400 python -m scripts.train \
  --dataset packed_coco --dataroot datasets/synth16k --coco_val_split hash \
  --skip_generation 1 --batch_size 64 \
  --num_iterations "$STEPS" \
  --image_size 256,256 \
  --num_val_samples 256 \
  --min_objects 3 \
  --learned_converse 1 --learned_transitivity 1 \
  --seed "$SEED" \
  --print_every 500 --checkpoint_every 1000 \
  --continue_on_error 1 \
  --output_dir "$OUT" 2>&1 | grep -v "^t = " | tail -60
rc=${PIPESTATUS[0]}
[ "$rc" -ne 0 ] && echo "=== arm FAILED rc=$rc"
exit "$rc"
