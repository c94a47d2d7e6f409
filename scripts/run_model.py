"""Run a trained model on user-authored CLEVR-style scene graphs —
counterpart of `scripts/run_model.py`.

Input JSON: a list of scene graphs in the reference's format
(run_model.py:19-52):

  [{"objects": [{"shape": "cube", "color": "brown",
                 "material": "metal", "size": "large"}, ...],
    "relationships": {"right": [[], [0, 2], [0]],
                      "behind": [[], [0], [0, 1]],
                      "front": [...], "left": [...]}}]

relationships[name][i] lists the object indices j with (i, name, j). CLEVR
directional predicates map onto the framework's augmented spatial relations
(right/left -> __right of__/__left of__, behind/front -> __above__/__below__,
the image-plane direction CLEVR's camera induces). Can also auto-generate
sparse/dense/hyper-dense graphs for N objects like the reference's
`auto_create_graphs`.

Outputs per scene: predicted boxes (+ image when the checkpoint has the
generator), a box-overlay PNG, and a graphviz scene-graph rendering.
"""
from __future__ import annotations

import argparse
import json
import os

from canonicalsg2im_tpu.utils.platform import apply_platform_override

apply_platform_override()

import jax
import numpy as np

from canonicalsg2im_tpu.config import Config
from canonicalsg2im_tpu.data.canonicalize import augment_triplets
from canonicalsg2im_tpu.data.pipeline import Batch, bucket_for
from canonicalsg2im_tpu.data.vocab import build_clevr_vocab
from canonicalsg2im_tpu.models.sg2layout import symmetrize_converse
from canonicalsg2im_tpu.train.gan import (
    create_gan_states,
    gan_eval_step,
    step_cfg_from_config,
)
from canonicalsg2im_tpu.utils import restore_checkpoint
from canonicalsg2im_tpu.utils.vis import draw_boxes_on_image, draw_scene_graph

CLEVR_REL_MAP = {
    "right": "__right of__",
    "left": "__left of__",
    "behind": "__above__",
    "front": "__below__",
}


def graph_to_sample(sg, vocab, cfg, conv_weights, rng):
    attr_names = list(vocab["attributes"])
    objs = np.array(
        [[vocab["attributes"][a][obj[a]] for a in attr_names]
         for obj in sg["objects"]], np.int32)
    triplets = []
    for rel, per_subject in sg.get("relationships", {}).items():
        p = vocab["pred_name_to_idx"][CLEVR_REL_MAP.get(rel, rel)]
        for s, others in enumerate(per_subject):
            for o in others:
                triplets.append([s, p, int(o)])
    triplets, conv_counts, triplet_type = augment_triplets(
        triplets, vocab, learned_converse=cfg.learned_converse,
        learned_transitivity=cfg.learned_transitivity,
        converse_weights=conv_weights, rng=rng)
    return objs, triplets.astype(np.int32), conv_counts, \
        triplet_type.astype(np.int32)


def auto_create_graphs(num_objs, rng):
    """Sparse / dense / hyper-dense random graphs over num_objs objects
    (reference auto_create_graphs, run_model.py:56+)."""
    colors = ["gray", "red", "blue", "green", "brown", "purple", "cyan",
              "yellow"]
    objects = [{"shape": "cylinder", "color": colors[i % len(colors)],
                "material": "rubber", "size": "large"}
               for i in range(num_objs)]
    graphs = []
    for density in ("sparse", "dense", "hyper"):
        rels = {k: [[] for _ in range(num_objs)] for k in CLEVR_REL_MAP}
        for i in range(num_objs):
            for j in range(num_objs):
                if i == j:
                    continue
                p = {"sparse": 0.1, "dense": 0.4, "hyper": 0.9}[density]
                if rng.random() < p:
                    rels[["right", "behind"][int(rng.random() < 0.5)]][i].append(j)
        graphs.append({"objects": objects, "relationships": rels})
    return graphs


def main(args):
    run_args = os.path.join(os.path.dirname(args.checkpoint), "run_args.json")
    cfg = Config.load(run_args) if os.path.exists(run_args) else Config()
    cfg.merge_default_ladders()
    vocab = build_clevr_vocab()
    cfg.vocab = vocab
    cfg.finalize()

    states = create_gan_states(cfg, jax.random.PRNGKey(cfg.seed))
    states, _ = restore_checkpoint(args.checkpoint, like=states)
    sc = step_cfg_from_config(cfg)

    conv_weights = None
    if cfg.learned_converse and not cfg.skip_graph_model:
        conv_weights = np.asarray(jax.device_get(symmetrize_converse(
            states.g.params["sg_to_layout"]["converse_candidates_weights"])))

    rng = np.random.default_rng(args.seed)
    if args.scene_graphs_json:
        with open(args.scene_graphs_json) as f:
            graphs = json.load(f)
    else:
        graphs = auto_create_graphs(args.num_objs, rng)

    os.makedirs(args.output_dir, exist_ok=True)
    P = len(vocab["pred_name_to_idx"])
    pad = vocab["pred_name_to_idx"]["__padding__"]
    for gi, sg in enumerate(graphs):
        objs, triplets, conv_counts, ttype = graph_to_sample(
            sg, vocab, cfg, conv_weights, rng)
        O = bucket_for(objs.shape[0], cfg.bucket_objects)
        T = bucket_for(max(len(triplets), 1), cfg.bucket_triplets)
        b_objs = np.zeros((1, O, objs.shape[1]), np.int32)
        b_objs[0, :objs.shape[0]] = objs
        b_trip = np.zeros((1, T, 3), np.int32)
        b_trip[:, :, 1] = pad
        b_trip[0, :len(triplets)] = triplets
        b_type = np.zeros((1, T), np.int32)
        b_type[0, :len(ttype)] = ttype
        batch = Batch(
            imgs=np.zeros((1, cfg.image_size[0], cfg.image_size[1], 3),
                          np.float32),
            objs=b_objs, boxes=np.full((1, O, 4), -1.0, np.float32),
            triplets=b_trip, conv_counts=conv_counts[None],
            triplet_type=b_type, masks=None,
            image_ids=np.array([gi], np.int64))
        img, boxes_pred, _, _ = gan_eval_step(
            states, batch, jax.random.PRNGKey(0), sc=sc, use_gt=False)
        boxes = np.clip(np.asarray(boxes_pred)[0, :objs.shape[0]], 0, 1)
        print(f"graph {gi}: predicted boxes\n{boxes}")
        canvas = (np.asarray(img)[0] if img is not None
                  else np.full((*cfg.image_size, 3), -1.0, np.float32))
        labels = [sg["objects"][i]["shape"] for i in range(objs.shape[0])]
        draw_boxes_on_image(canvas, boxes, labels,
                            os.path.join(args.output_dir, f"sg_{gi}.png"))
        draw_scene_graph(labels, triplets, vocab,
                         os.path.join(args.output_dir, f"sg_{gi}_graph.png"))
    print("outputs ->", args.output_dir)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--scene_graphs_json", default=None)
    ap.add_argument("--num_objs", type=int, default=5)
    ap.add_argument("--output_dir", default="outputs/run_model")
    ap.add_argument("--seed", type=int, default=0)
    main(ap.parse_args())
