#!/bin/bash
# Round-4 data-scale flagship (VERDICT r3 task 3): >=10k steps of the full
# WSGC GAN at 256^2/batch 16 over 16,384 DISTINCT disk images (~10
# data-epochs — not the r3b run's 156 epochs over 2,048), fed by the
# RotatingDevicePool streaming path, with a held-out val split
# (synth16k val2017, hash split). Resumable: pass a checkpoint path.
#
# Usage: flagship_r4.sh [resume_ckpt]
set -u
cd /root/repo
OUT=out/wsgc_gan_256_r4
RESUME=${1:-}
EXTRA=()
if [ -n "$RESUME" ]; then
  EXTRA+=(--restore_checkpoint 1 --checkpoint_name "$RESUME")
fi
exec python -m scripts.train \
  --dataset packed_coco --dataroot datasets/synth16k --coco_val_split hash \
  --num_iterations 10000 \
  --batch_size 16 --image_size 256,256 \
  --num_train_samples 16384 --num_val_samples 64 \
  --min_objects 3 \
  --learned_converse 1 --learned_transitivity 1 \
  --print_every 100 --checkpoint_every 1000 \
  --steps_per_dispatch 10 --host_prefetch_blocks 1 \
  --device_image_pool 1 --device_pool_dtype bfloat16 \
  --pool_segment_size 2048 --pool_passes_per_segment 2 \
  --continue_on_error 1 \
  --output_dir "$OUT" "${EXTRA[@]}" >> "$OUT.log" 2>&1
