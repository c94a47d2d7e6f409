#!/bin/bash
# ARM D — arm C (mild texture, JPEG) still saturated by step 800: the one
# cue every dead-D run shares and no conv generator can imitate is JPEG
# DCT ringing/blocking; the one live-D run (r3b, 20k steps in-band) trained
# on procedurally-rendered in-memory images with NO codec artifacts. This
# arm stores the same mild-texture scenes as PNG (--image_format png).
# Original arm C rationale follows:
# ARM C — the r3b-regime hypothesis: the image D dies not because real data
# is too EASY to tell apart (r4 VERDICT's guess) but because it is too HARD
# for the generator to imitate at 16k scale: r3b (flat 2k images) kept a
# live D for 20k steps, while r4 (flat 16k), r5 arm A (photometric 1.0),
# and three noise-sigma arms all saturated within ~1000 steps. This arm
# pairs MILD texture (--photometric 0.3, datasets/synth16k_png — hard
# enough that real images are not flat fields, easy enough that the
# generator can close the gap) with multi-scale instance noise sigma 1.0
# annealed to 0 by step 8000 (the last 2000 steps run reference-exact
# dynamics: if G has closed the gap, D stays in-band on its own).
# Round-5 flagship, arm B: same photometric-hardened data and config as
# flagship_r5.sh, plus the BEYOND-REFERENCE annealed instance noise on the
# image-D inputs (--d_instance_noise). Arm A (out/wsgc_gan_256_r5) proved
# data hardening alone does not keep the hinge D in-band: D_img_real/fake
# saturate to exactly 0.0 by step ~300 (r4 pattern), leaving the generated
# panels with ~13x the real images' high-frequency energy (dither) that the
# dead D never penalizes. Instance noise overlaps the real/fake supports so
# the margin stays populated (train/gan.py::_make_d_noise). Sigma ladder
# measured this round: 0.15 and 0.5 both leave D pinned at ~1e-4 within
# 500-900 steps (out/wsgc_gan_256_r5n_sigma{015,05}.log) — per-pixel noise
# is low-passed away by the D's strided scales while the generator's
# 8-px-period glyph texture stays a giant coherent cue. This arm: sigma
# 1.0 annealed over 12000 (so sigma ~0.17 at step 10k, never fully off
# in-run) + the reference's own --img_learning_rate halved to 5e-5 (mild
# TTUR toward G).
# Gates (VERDICT r4 task 1): D_img_real/fake in a nonzero band for the whole
# run, no dither in val/10000 panels, val IoU >= 0.54.
#
# Usage: flagship_r5_noise.sh [resume_ckpt]
set -u
cd /root/repo
OUT=out/wsgc_gan_256_r5d
RESUME=${1:-}
EXTRA=()
if [ -n "$RESUME" ]; then
  EXTRA+=(--restore_checkpoint 1 --checkpoint_name "$RESUME")
fi
exec python -m scripts.train \
  --dataset packed_coco --dataroot datasets/synth16k_png --coco_val_split hash \
  --num_iterations 10000 \
  --batch_size 16 --image_size 256,256 \
  --num_train_samples 16384 --num_val_samples 64 \
  --min_objects 3 \
  --learned_converse 1 --learned_transitivity 1 \
  --print_every 100 --checkpoint_every 1000 \
  --steps_per_dispatch 10 --host_prefetch_blocks 1 \
  --device_image_pool 1 --device_pool_dtype bfloat16 \
  --pool_segment_size 2048 --pool_passes_per_segment 2 \
  --proxy_metrics 1 --proxy_weights weights/proxy_features.npz \
  --d_instance_noise 1.0 --d_noise_anneal 8000 \
  --img_learning_rate 5e-5 \
  --continue_on_error 1 \
  --output_dir "$OUT" "${EXTRA[@]}" >> "$OUT.log" 2>&1
