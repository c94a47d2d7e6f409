#!/bin/bash
# Round-3 flagship: 20k-step full WSGC GAN at 256^2 batch 16 on the chip
# (VERDICT r2 task 4), fed at device rate by the DeviceImagePool (task 5).
# Usage: flagship_r3.sh [resume_ckpt]
set -u
cd /root/repo
OUT=out/wsgc_gan_256_r3b
RESUME=${1:-}
EXTRA=()
if [ -n "$RESUME" ]; then
  EXTRA+=(--restore_checkpoint 1 --checkpoint_name "$RESUME")
fi
exec python -m scripts.train \
  --dataset packed_clevr_syn --num_iterations 20000 \
  --batch_size 16 --image_size 256,256 \
  --num_train_samples 2048 --num_val_samples 64 \
  --min_objects 3 --max_objects 10 \
  --learned_converse 1 --learned_transitivity 1 \
  --print_every 100 --checkpoint_every 1000 \
  --steps_per_dispatch 10 --host_prefetch_blocks 1 \
  --device_image_pool 1 --device_pool_dtype bfloat16 \
  --bucket_objects 16 --bucket_triplets 512 \
  --output_dir "$OUT" "${EXTRA[@]}" >> "$OUT.log" 2>&1
