#!/bin/bash
# Round-4 streaming-input measurement (VERDICT r3 task 2): full GAN at
# 256^2/batch 16 over a 16,384-image synthetic-COCO dataset ON DISK
# (datasets/synth16k, reference COCO-Stuff layout) — 8x the r3b flagship's
# HBM-resident pool, too big to hold at once. The RotatingDevicePool
# streams it through HBM in 2048-image segments (bf16: 0.81 GB resident x2)
# while training proceeds; PASSES sets shuffled passes per resident segment
# (1 = pure streaming).
#
# Usage: streaming_r4.sh [STEPS] [PASSES] [OUT]
set -u
cd /root/repo
STEPS=${1:-800}
PASSES=${2:-1}
OUT=${3:-out/stream_coco16k}
exec python -m scripts.train \
  --dataset packed_coco --dataroot datasets/synth16k --coco_val_split hash \
  --num_iterations "$STEPS" \
  --batch_size 16 --image_size 256,256 \
  --num_train_samples 16384 --num_val_samples 64 \
  --min_objects 3 \
  --learned_converse 1 --learned_transitivity 1 \
  --print_every 100 --checkpoint_every 2000 \
  --steps_per_dispatch 10 --host_prefetch_blocks 1 \
  --device_image_pool 1 --device_pool_dtype bfloat16 \
  --pool_segment_size 2048 --pool_passes_per_segment "$PASSES" \
  --continue_on_error 1 \
  --output_dir "$OUT" >> "$OUT.log" 2>&1
