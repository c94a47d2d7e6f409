"""Layout -> Image generation from a results dataframe — counterpart of
`scripts/generation_dataframe.py`.

Consumes the ``results_<dataset>.csv`` written by scripts.layout_generation
(predicted/gt boxes + class strings per image), runs the AttSPADE generator
only (skip_graph_model), accumulates Inception Score, and dumps JPEGs under
``<output_dir>/generation/`` (reference generation_dataframe.py:17-94).

  python -m scripts.generation_dataframe --checkpoint out/run/itr_N.ckpt \
      --csv out/run/results_packed_clevr_syn.csv [--use_gt_boxes 1]
"""
from __future__ import annotations

import argparse
import ast
import csv
import os

from canonicalsg2im_tpu.utils.platform import apply_platform_override

apply_platform_override()

import jax
import numpy as np

from canonicalsg2im_tpu.config import Config
from canonicalsg2im_tpu.train.gan import (
    create_gan_states,
    gan_eval_step,
    step_cfg_from_config,
)
from canonicalsg2im_tpu.utils import restore_checkpoint
from canonicalsg2im_tpu.data.pipeline import Batch, bucket_for


def parse_rows(csv_path, use_gt_boxes: bool, vocab):
    """Rows -> (objs, boxes, image_id) triples (generation_dataframe.py:27-60)."""
    attr_names = list(vocab["attributes"])
    out = []
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            boxes = np.asarray(
                ast.literal_eval(row["gt_boxes" if use_gt_boxes
                                     else "predicted_boxes"]),
                dtype=np.float32)
            classes = ast.literal_eval(row["class"])
            n = boxes.shape[0]
            objs = np.zeros((n, len(attr_names)), dtype=np.int32)
            for i, cname in enumerate(classes[:n]):
                table = vocab["attributes"][attr_names[0]]
                objs[i, 0] = table.get(cname, 1)
                for a in range(1, len(attr_names)):
                    objs[i, a] = 1  # attributes beyond class are unknown
            out.append((objs, boxes, int(row["image_id"])))
    return out


def main(args):
    run_args = os.path.join(os.path.dirname(args.checkpoint), "run_args.json")
    cfg = Config.load(run_args) if os.path.exists(run_args) else Config()
    cfg.merge_default_ladders()
    cfg.skip_graph_model = False  # checkpoint shape must match training

    from canonicalsg2im_tpu.data import get_dataset

    ds = get_dataset(cfg.dataset, "val", cfg)
    cfg.vocab = ds.vocab
    cfg.finalize()

    states = create_gan_states(cfg, jax.random.PRNGKey(cfg.seed))
    states, counters = restore_checkpoint(args.checkpoint, like=states)
    sc = step_cfg_from_config(cfg)

    from canonicalsg2im_tpu.evaluation.inception import InceptionScore

    inception = InceptionScore(cfg.weights_dir)
    if not inception.pretrained:
        print("WARNING: fixed-seed Inception weights; IS not comparable.")

    rows = parse_rows(args.csv, bool(args.use_gt_boxes), cfg.vocab)
    out_dir = os.path.join(args.output_dir
                           or os.path.dirname(args.checkpoint), "generation")
    os.makedirs(out_dir, exist_ok=True)

    try:
        from PIL import Image
    except ImportError:
        Image = None

    P = len(cfg.vocab["pred_name_to_idx"])
    pad_pred = cfg.vocab["pred_name_to_idx"]["__padding__"]
    B = cfg.batch_size
    count = 0
    for start in range(0, len(rows), B):
        chunk = rows[start:start + B]
        if len(chunk) < B:
            break
        O = bucket_for(max(o.shape[0] for o, _, _ in chunk), cfg.bucket_objects)
        objs = np.zeros((B, O, len(cfg.vocab["attributes"])), np.int32)
        boxes = np.full((B, O, 4), -1.0, np.float32)
        ids = np.zeros((B,), np.int64)
        for i, (o, b, iid) in enumerate(chunk):
            objs[i, :o.shape[0]] = o
            boxes[i, :b.shape[0]] = b
            ids[i] = iid
        T = cfg.bucket_triplets[0]
        triplets = np.zeros((B, T, 3), np.int32)
        triplets[:, :, 1] = pad_pred
        batch = Batch(
            imgs=np.zeros((B, cfg.image_size[0], cfg.image_size[1], 3),
                          np.float32),
            objs=objs, boxes=boxes, triplets=triplets,
            conv_counts=np.zeros((B, P, P + 1), np.float32),
            triplet_type=np.zeros((B, T), np.int32), masks=None,
            image_ids=ids)
        img, *_ = gan_eval_step(states, batch, jax.random.PRNGKey(0), sc=sc,
                                use_gt=True)
        img = np.asarray(img)
        inception(img)
        if Image is not None:
            arr = np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)
            for i in range(B):
                Image.fromarray(arr[i]).save(
                    os.path.join(out_dir, f"{ids[i]}.jpg"))
        count += B
        if args.max_samples and count >= args.max_samples:
            break

    mean, std = inception.compute_score(splits=5)
    print(f"Generated {count} images -> {out_dir}")
    print(f"Inception mean: {mean:.4f}  std: {std:.4f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--csv", required=True)
    ap.add_argument("--use_gt_boxes", type=int, default=0)
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--max_samples", type=int, default=None)
    main(ap.parse_args())
