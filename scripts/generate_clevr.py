"""Large-graph synthetic CLEVR generation — counterpart of
`scripts/generate_clevr.py`.

Generates synthetic scenes with many objects (reference default: 1000 scenes
of 15-30 objects, generate_clevr.py:311-314), runs one or two checkpoints
(e.g. WSGC "learned" vs a baseline) through SG->Layout (+ optional AttSPADE
image generation), and reports box IoU (+ Inception Score when generating
images).

  python -m scripts.generate_clevr --checkpoint out/wsgc/itr_N.ckpt \
      [--baseline_checkpoint out/base/itr_M.ckpt] \
      --min_objects 15 --max_objects 30 --num_scenes 1000
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
from canonicalsg2im_tpu.evaluation.metrics import jaccard
from canonicalsg2im_tpu.losses.bbox import real_object_mask
from canonicalsg2im_tpu.models.sg2layout import symmetrize_converse
from canonicalsg2im_tpu.train import create_layout_state, layout_eval_step
from canonicalsg2im_tpu.utils import restore_checkpoint


def load_generator(gen_ckpt_path):
    """AttSPADE GAN checkpoint -> (states, step_cfg, image_size). Used to
    render images from each arm's predicted layouts and run the on-device
    FID/IS eval (driver config 5; reference FID tooling:
    evaluation/fid/fid_score.py)."""
    from canonicalsg2im_tpu.train.gan import (
        create_gan_states,
        step_cfg_from_config,
    )

    run_args = os.path.join(os.path.dirname(gen_ckpt_path), "run_args.json")
    cfg = Config.load(run_args)
    ds = get_dataset(cfg.dataset, "train", cfg)
    cfg.vocab = ds.vocab
    cfg.finalize()
    states = create_gan_states(cfg, jax.random.PRNGKey(cfg.seed))
    states, _ = restore_checkpoint(gen_ckpt_path, like=states)
    return states, step_cfg_from_config(cfg), tuple(cfg.image_size)


def evaluate_checkpoint(tag, ckpt_path, args, generator=None):
    run_args = os.path.join(os.path.dirname(ckpt_path), "run_args.json")
    cfg = Config.load(run_args) if os.path.exists(run_args) else Config()
    cfg.dataset = "packed_clevr_syn"
    # render procedural reference images only when the FID arm needs them
    cfg.skip_generation = generator is None
    cfg.min_objects = args.min_objects
    cfg.max_objects = args.max_objects
    cfg.num_train_samples = args.num_scenes
    cfg.batch_size = args.batch_size
    if generator is not None:
        cfg.image_size = list(generator[2])
    cfg.merge_default_ladders()

    ds = get_dataset(cfg.dataset, "train", cfg)
    cfg.vocab = ds.vocab
    cfg.finalize()
    state = create_layout_state(cfg, jax.random.PRNGKey(cfg.seed))
    state, counters = restore_checkpoint(ckpt_path, like=state)

    loader = BucketedLoader(ds, cfg.batch_size, shuffle=False, prefetch=2,
                            bucket_objects=cfg.bucket_objects,
                            bucket_triplets=cfg.bucket_triplets,
                            drop_last=False, seed=args.seed)
    if cfg.learned_converse:
        w = symmetrize_converse(state.params["converse_candidates_weights"])
        loader.set_converse_weights(np.asarray(jax.device_get(w)))

    fid_real = fid_fake = iscore = None
    if generator is not None:
        from canonicalsg2im_tpu.evaluation.fid import FidActivations
        from canonicalsg2im_tpu.evaluation.inception import InceptionScore

        fid_real = FidActivations(args.weights_dir)
        fid_fake = FidActivations(args.weights_dir)
        iscore = InceptionScore(args.weights_dir)

    tot = {"iou": 0.0, "iou03": 0.0, "iou05": 0.0, "n": 0.0}
    rng = jax.random.PRNGKey(0)
    for batch in loader:
        _, boxes_pred, _, _ = layout_eval_step(state, batch, rng)
        boxes_pred = np.clip(np.asarray(boxes_pred), 0.0, 1.0)
        real = np.asarray(real_object_mask(batch.objs))
        iou, iou05, iou03 = map(np.asarray, jaccard(boxes_pred, batch.boxes))
        tot["iou"] += float((iou * real).sum())
        tot["iou03"] += float((iou03 * real).sum())
        tot["iou05"] += float((iou05 * real).sum())
        tot["n"] += float(real.sum())
        if generator is not None:
            from canonicalsg2im_tpu.train.gan import gan_eval_step

            states, sc, _ = generator
            # render THIS arm's predicted layout: swap the predicted boxes in
            # as the "gt" boxes of the generation forward
            gen_batch = batch._replace(boxes=boxes_pred)
            img, _, _, _ = gan_eval_step(states, gen_batch, rng, sc=sc,
                                         use_gt=True, use_gt_masks=False)
            fid_fake(img)
            iscore(img)
            fid_real(batch.imgs)
    n = max(tot["n"], 1.0)
    line = (f"[{tag}] scenes={args.num_scenes} objects/scene="
            f"{args.min_objects}-{args.max_objects} "
            f"avg_iou={tot['iou']/n:.4f} iou03={tot['iou03']/n:.4f} "
            f"iou05={tot['iou05']/n:.4f}")
    if generator is not None:
        from canonicalsg2im_tpu.evaluation.fid import (
            calculate_frechet_distance)

        fid = calculate_frechet_distance(*fid_real.statistics(),
                                         *fid_fake.statistics())
        is_mean, is_std = iscore.compute_score(splits=5)
        pretrained = fid_real.pretrained
        line += (f" FID={fid:.2f} IS={is_mean:.2f}+-{is_std:.2f}"
                 + ("" if pretrained else " (random-weight inception — "
                    "relative comparison only)"))
    print(line)
    return tot["iou"] / n


def main(args):
    generator = (load_generator(args.generation_checkpoint)
                 if args.generation_checkpoint else None)
    results = {"learned": evaluate_checkpoint("learned", args.checkpoint,
                                              args, generator)}
    if args.baseline_checkpoint:
        results["not_learned"] = evaluate_checkpoint(
            "not_learned", args.baseline_checkpoint, args, generator)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--baseline_checkpoint", default=None)
    ap.add_argument("--generation_checkpoint", default=None,
                    help="AttSPADE GAN checkpoint: render each arm's "
                    "predicted layouts and report on-device FID vs the "
                    "procedural reference renders + Inception Score")
    ap.add_argument("--num_scenes", type=int, default=1000)
    ap.add_argument("--min_objects", type=int, default=15)
    ap.add_argument("--max_objects", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--weights_dir", default="weights")
    main(ap.parse_args())
