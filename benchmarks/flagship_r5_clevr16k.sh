#!/bin/bash
# Round-5 FINAL flagship: healthy adversarial dynamics at data scale.
#
# The six-arm saturation study (docs/RESULTS.md round 5) established the
# regime boundary: on ON-DISK synthetic images the hinge image-D separates
# real from fake within ~1k steps no matter how the data is hardened
# ({flat,photometric,mild}-JPEG, mild-PNG) or the inputs noised
# (iid sigma 0.15/0.5/1.0, multiscale 1.0, TTUR img_lr/2) — codec and
# texture statistics are outside the generator family's reach. The ONE
# live-D regime in this repo is procedurally-rendered scenes (r3b: 20k
# steps in-band at 2,048 scenes). This run demonstrates that regime at the
# r4 data-scale flagship's scale: 16,384 DISTINCT procedural scenes
# (packed_clevr_syn, per-index rng streams), 10k steps, 256^2/batch 16,
# REFERENCE-EXACT dynamics (no instance noise, default lrs).
# Gates: D_img_real/fake in a nonzero band the whole run; no dither
# (8-px glyphs) in val/10000 panels; val IoU reported.
set -u
cd /root/repo
OUT=out/wsgc_clevr16k_r5
RESUME=${1:-}
EXTRA=()
if [ -n "$RESUME" ]; then
  EXTRA+=(--restore_checkpoint 1 --checkpoint_name "$RESUME")
fi
exec python -m scripts.train \
  --dataset packed_clevr_syn \
  --num_iterations 10000 \
  --batch_size 16 --image_size 256,256 \
  --num_train_samples 16384 --num_val_samples 64 \
  --min_objects 3 --max_objects 10 \
  --learned_converse 1 --learned_transitivity 1 \
  --print_every 100 --checkpoint_every 1000 \
  --steps_per_dispatch 10 --host_prefetch_blocks 1 \
  --device_image_pool 1 --device_pool_dtype bfloat16 \
  --pool_segment_size 2048 --pool_passes_per_segment 2 \
  --continue_on_error 1 \
  --output_dir "$OUT" "${EXTRA[@]}" >> "$OUT.log" 2>&1
