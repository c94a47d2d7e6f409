"""Inference (serving) throughput: AttSPADE generator eval forward.

Measures images/sec for the full generation path (SG->Layout + AttSPADE
forward, train=False) with the Pallas inference fusions toggled:

  - base:  XLA everywhere
  - fused: fused SPADE eval kernel (ops/pallas_spade.py, blocks <= 64 px)
           + sparse Pallas box splat (ops/pallas_splat.py)

Run: python -m scripts.bench_infer
Env: INFER_IMAGE_SIZE (default 256), INFER_BATCH (8), INFER_ITERS (30).
"""
from __future__ import annotations

import json
import os
import time

from canonicalsg2im_tpu.utils.platform import apply_platform_override

apply_platform_override()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from canonicalsg2im_tpu.config import Config  # noqa: E402
from canonicalsg2im_tpu.data import BucketedLoader, get_dataset  # noqa: E402
from canonicalsg2im_tpu.models.meta import MetaGeneratorModel  # noqa: E402
from canonicalsg2im_tpu.train.gan import create_gan_states  # noqa: E402

size = int(os.environ.get("INFER_IMAGE_SIZE", 256))
batch = int(os.environ.get("INFER_BATCH", 8))
iters = int(os.environ.get("INFER_ITERS", 30))


def build(fused_splat: bool, fused_spade: bool):
    cfg = Config(dataset="packed_clevr_syn", image_size=(size, size),
                 batch_size=batch, num_train_samples=64, min_objects=3,
                 max_objects=10,
                 use_pallas_splat_eval=fused_splat,
                 fused_spade_eval=fused_spade)
    ds = get_dataset(cfg.dataset, "train", cfg)
    cfg.vocab = ds.vocab
    cfg.finalize()
    loader = BucketedLoader(ds, batch, seed=0, prefetch=0,
                            bucket_objects=(16,), bucket_triplets=(512,))
    b0 = next(iter(loader))
    states = create_gan_states(cfg, jax.random.PRNGKey(0))
    model = MetaGeneratorModel.from_config(cfg)

    @jax.jit
    def fwd(params, batch_stats, objs, boxes):
        img, _, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            objs, jax.numpy.zeros_like(b0.triplets),
            jax.numpy.zeros_like(b0.triplet_type),
            boxes_gt=boxes, train=False,
            rngs={"noise": jax.random.PRNGKey(2)})
        return img

    return fwd, states.g.params, states.g.batch_stats, b0


def run(fused_splat: bool, fused_spade: bool):
    fwd, params, stats, b0 = build(fused_splat, fused_spade)
    img = fwd(params, stats, b0.objs, b0.boxes)
    float(jax.device_get(img.sum()))  # sync (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(iters):
        img = fwd(params, stats, b0.objs, b0.boxes)
    float(jax.device_get(img.sum()))
    dt = time.perf_counter() - t0
    return iters * batch / dt


base = run(False, False)
splat = run(True, False)
spade = run(False, True)
both = run(True, True)
print(json.dumps({
    "metric": "attspade_%d_infer_images_per_sec_per_chip" % size,
    "base": round(base, 2), "pallas_splat": round(splat, 2),
    "fused_spade": round(spade, 2), "both": round(both, 2),
    "best_speedup": round(max(splat, spade, both) / base, 3),
}))
