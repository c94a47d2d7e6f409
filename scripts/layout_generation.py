"""SG->Layout inference + IoU eval — counterpart of
`scripts/layout_generation.py` in the reference.

Loads a checkpoint and its sibling ``run_args.json``, evaluates box IoU over
the requested partition, prints avg_iou / iou@0.3 / iou@0.5, and writes
``results_<dataset>.csv`` with the reference's schema
(layout_generation.py:59-61, train.py:171-231) — the CSV that
scripts.generation_dataframe consumes.

  python -m scripts.layout_generation --checkpoint out/run/itr_1000.ckpt \
      [--partition val] [--output_dir out/run]
"""
from __future__ import annotations

import argparse
import csv
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


def object_class_names(cfg, objs_row):
    vocab = cfg.vocab
    if objs_row.shape[-1] == 1:
        names = {int(k): v for k, v in
                 (vocab["object_idx_to_name"].items()
                  if isinstance(vocab["object_idx_to_name"], dict)
                  else enumerate(vocab["object_idx_to_name"]))}
        return [names.get(int(o), str(int(o))) for o in objs_row[:, 0]]
    shapes = vocab["reverse_attributes"]["shape"]
    return [shapes.get(int(o), shapes.get(str(int(o)), str(int(o))))
            for o in objs_row[:, 0]]


def best_checkpoint(run_dir: str) -> str:
    """Pick the checkpoint with the best val avg_iou — from this framework's
    metrics.jsonl when present, else from the run directory's TensorBoard
    event files exactly like the reference (layout_generation.py:76-85,
    argmax over scalar tag 'val/loss/avg_iou'), so a reference user's
    existing run dirs drive selection unchanged
    (canonicalsg2im_tpu/utils/tb_events.py)."""
    import json as _json

    best_t, best_iou = None, -1.0
    metrics_path = os.path.join(run_dir, "metrics.jsonl")
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            for line in f:
                rec = _json.loads(line)
                if rec.get("tag") == "val/loss" and "avg_iou" in rec:
                    if rec["avg_iou"] > best_iou:
                        best_iou, best_t = rec["avg_iou"], rec["step"]
    else:
        from canonicalsg2im_tpu.utils.tb_events import best_step_from_events

        best_t, best_iou = best_step_from_events(run_dir, "val/loss/avg_iou")
    if best_t is None:
        raise FileNotFoundError(f"no val avg_iou records in {run_dir}")
    print(f"Best checkpoint: itr_{best_t} (avg_iou={best_iou:.4f})")
    ours = os.path.join(run_dir, f"itr_{best_t}.ckpt")
    if os.path.exists(ours):
        return ours
    ref = os.path.join(run_dir, f"itr_{best_t}.pt")
    if os.path.exists(ref):
        raise SystemExit(
            f"best checkpoint is the reference-format {ref}; convert it "
            f"first:\n  python -m scripts.convert_reference_checkpoint "
            f"{ref} --out {ours}")
    return ours


def main(args):
    if os.path.isdir(args.checkpoint):
        args.checkpoint = best_checkpoint(args.checkpoint)
    run_args = os.path.join(os.path.dirname(args.checkpoint), "run_args.json")
    cfg = Config.load(run_args) if os.path.exists(run_args) else Config()
    cfg.merge_default_ladders()
    if args.dataset:
        cfg.dataset = args.dataset
    cfg.skip_generation = True

    ds = get_dataset(cfg.dataset, args.partition, cfg)
    cfg.vocab = ds.vocab
    cfg.finalize()

    state = create_layout_state(cfg, jax.random.PRNGKey(cfg.seed))
    state, counters = restore_checkpoint(args.checkpoint, like=state)
    print(f"Restored checkpoint at t={counters.get('t')}")

    loader = BucketedLoader(ds, cfg.batch_size, shuffle=False, prefetch=2,
                            bucket_objects=cfg.bucket_objects,
                            bucket_triplets=cfg.bucket_triplets,
                            drop_last=False, seed=cfg.seed)
    if cfg.learned_converse:
        w = symmetrize_converse(
            state.params["converse_candidates_weights"])
        loader.set_converse_weights(np.asarray(jax.device_get(w)))

    rows = []
    tot_iou = tot_03 = tot_05 = tot_n = 0.0
    rng = jax.random.PRNGKey(0)
    for batch in loader:
        _, boxes_pred, _, _ = layout_eval_step(state, batch, rng)
        boxes_pred = np.clip(np.asarray(boxes_pred), 0.0, 1.0)
        real = np.asarray(real_object_mask(batch.objs))
        iou, iou05, iou03 = map(np.asarray,
                                jaccard(boxes_pred, batch.boxes))
        for i in range(batch.objs.shape[0]):
            m = real[i]
            if not m.any():
                continue
            bi, b5, b3 = iou[i][m], iou05[i][m], iou03[i][m]
            tot_iou += bi.sum(); tot_05 += b5.sum(); tot_03 += b3.sum()
            tot_n += float(m.sum())
            rows.append({
                "image_id": int(batch.image_ids[i]),
                "avg_iou": float(np.mean(bi)),
                "iou03": float(np.mean(b3)),
                "iou05": float(np.mean(b5)),
                "predicted_boxes": str(boxes_pred[i][m].tolist()),
                "gt_boxes": str(np.asarray(batch.boxes[i][m]).tolist()),
                "number_of_objects": int(m.sum()),
                "class": str(object_class_names(cfg,
                                                np.asarray(batch.objs[i])[m])),
            })
        if args.max_samples and len(rows) >= args.max_samples:
            break

    out_dir = args.output_dir or os.path.dirname(args.checkpoint)
    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, f"results_{cfg.dataset}.csv")
    with open(csv_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    n = max(tot_n, 1.0)
    print(f"avg_iou: {tot_iou / n:.4f}")
    print(f"total_iou_03: {tot_03 / n:.4f}")
    print(f"total_iou_05: {tot_05 / n:.4f}")
    print("results ->", csv_path)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--partition", default="val")
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--max_samples", type=int, default=None)
    main(ap.parse_args())
