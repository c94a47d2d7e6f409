"""End-to-end dataset generation with AttSPADE — counterpart of
`scripts/generation_attspade.py`.

Loads a trained checkpoint, iterates a dataset partition, generates images
through BOTH the GT-layout and predicted-layout paths, accumulates a separate
Inception Score for each (the reference's inception_score_gt /
inception_score_pred, generation_attspade.py:127-136), and dumps images.

  python -m scripts.generation_attspade --checkpoint out/gan/itr_N.ckpt \
      [--dataset packed_clevr_syn] [--partition val]
"""
from __future__ import annotations

import argparse
import os

from canonicalsg2im_tpu.utils.platform import apply_platform_override

apply_platform_override()

import jax
import numpy as np

from canonicalsg2im_tpu.config import Config
from canonicalsg2im_tpu.data import BucketedLoader, get_dataset
from canonicalsg2im_tpu.evaluation.inception import InceptionScore
from canonicalsg2im_tpu.models.sg2layout import symmetrize_converse
from canonicalsg2im_tpu.train.gan import (
    create_gan_states,
    gan_eval_step,
    step_cfg_from_config,
)
from canonicalsg2im_tpu.utils import restore_checkpoint


def main(args):
    run_args = os.path.join(os.path.dirname(args.checkpoint), "run_args.json")
    cfg = Config.load(run_args) if os.path.exists(run_args) else Config()
    cfg.merge_default_ladders()
    if args.dataset:
        cfg.dataset = args.dataset

    ds = get_dataset(cfg.dataset, args.partition, cfg)
    cfg.vocab = ds.vocab
    cfg.finalize()
    states = create_gan_states(cfg, jax.random.PRNGKey(cfg.seed))
    states, counters = restore_checkpoint(args.checkpoint, like=states)
    sc = step_cfg_from_config(cfg)

    loader = BucketedLoader(ds, cfg.batch_size, shuffle=False, prefetch=2,
                            bucket_objects=cfg.bucket_objects,
                            bucket_triplets=cfg.bucket_triplets, seed=cfg.seed)
    if cfg.learned_converse and not cfg.skip_graph_model:
        w = symmetrize_converse(
            states.g.params["sg_to_layout"]["converse_candidates_weights"])
        loader.set_converse_weights(np.asarray(jax.device_get(w)))

    is_gt = InceptionScore(cfg.weights_dir)
    is_pred = InceptionScore(cfg.weights_dir)
    out_dir = args.output_dir or os.path.join(
        os.path.dirname(args.checkpoint), "generation")
    os.makedirs(os.path.join(out_dir, "gt_layout"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "pred_layout"), exist_ok=True)
    try:
        from PIL import Image
    except ImportError:
        Image = None

    rng = jax.random.PRNGKey(0)
    count = 0
    for batch in loader:
        img_gt, *_ = gan_eval_step(states, batch, rng, sc=sc, use_gt=True)
        img_pred, *_ = gan_eval_step(states, batch, rng, sc=sc, use_gt=False)
        is_gt(np.asarray(img_gt))
        is_pred(np.asarray(img_pred))
        if Image is not None:
            for tag, imgs in (("gt_layout", img_gt), ("pred_layout", img_pred)):
                arr = np.clip((np.asarray(imgs) + 1) * 127.5, 0,
                              255).astype(np.uint8)
                for i in range(arr.shape[0]):
                    Image.fromarray(arr[i]).save(os.path.join(
                        out_dir, tag, f"{int(batch.image_ids[i])}.jpg"))
        count += batch.objs.shape[0]
        if args.max_samples and count >= args.max_samples:
            break

    for tag, acc in (("GT-layout", is_gt), ("pred-layout", is_pred)):
        mean, std = acc.compute_score(splits=5)
        print(f"{tag} Inception mean: {mean:.4f} std: {std:.4f}")
    print(f" >> Dataset generated in {out_dir} ({count} images)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--partition", default="val")
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--max_samples", type=int, default=None)
    main(ap.parse_args())
