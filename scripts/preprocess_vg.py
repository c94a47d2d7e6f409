"""Visual Genome JSON -> HDF5 preprocessor — counterpart of
`scripts/preprocess_packed_vg.py`.

Builds the object/relationship vocab from the training split (with alias
tables and minimum-instance filters), encodes per-image object and
relationship arrays into fixed-width HDF5 datasets, and writes vocab.json —
the exact input contract of data/vg.py (and the reference's VG loaders).

  python -m scripts.preprocess_vg --vg_dir datasets/vg --output_dir datasets/vg
"""
from __future__ import annotations

import argparse
import json
import os
from collections import Counter, defaultdict

import numpy as np


def load_aliases(path):
    aliases = {}
    if path and os.path.exists(path):
        with open(path) as f:
            for line in f:
                parts = [p.strip() for p in line.strip().split(",") if p.strip()]
                for p in parts[1:]:
                    aliases[p] = parts[0]
    return aliases


def canon(name, aliases):
    name = name.strip().lower()
    return aliases.get(name, name)


def build_vocab(objects, relationships, train_ids, obj_aliases, rel_aliases,
                min_object_instances, min_rel_instances):
    train = set(train_ids)
    obj_counts: Counter = Counter()
    for img in objects:
        if img["image_id"] not in train:
            continue
        for obj in img["objects"]:
            names = obj.get("names") or [obj.get("name", "")]
            if names and names[0]:
                obj_counts[canon(names[0], obj_aliases)] += 1
    kept_objs = [n for n, c in obj_counts.items() if c >= min_object_instances]

    rel_counts: Counter = Counter()
    for img in relationships:
        if img["image_id"] not in train:
            continue
        for rel in img["relationships"]:
            pred = canon(rel.get("predicate", ""), rel_aliases)
            if pred:
                rel_counts[pred] += 1
    kept_rels = [n for n, c in rel_counts.items() if c >= min_rel_instances]

    vocab = {
        "object_name_to_idx": {"__image__": 0},
        "pred_name_to_idx": {},
        "pred_idx_to_name": [],
    }
    for i, name in enumerate(sorted(kept_objs)):
        vocab["object_name_to_idx"][name] = i + 1
    vocab["object_idx_to_name"] = [None] * (len(kept_objs) + 1)
    for name, idx in vocab["object_name_to_idx"].items():
        vocab["object_idx_to_name"][idx] = name
    for name in sorted(kept_rels):
        vocab["pred_name_to_idx"][name] = len(vocab["pred_idx_to_name"])
        vocab["pred_idx_to_name"].append(name)
    return vocab


def encode_split(image_ids, image_meta, objects_by_image, rels_by_image,
                 vocab, obj_aliases, rel_aliases, max_objects, max_rels,
                 min_box, image_dir_depth=True):
    o2i = vocab["object_name_to_idx"]
    p2i = vocab["pred_name_to_idx"]
    rows = []
    for iid in image_ids:
        meta = image_meta.get(iid)
        if meta is None:
            continue
        objs = []
        id_map = {}
        for obj in objects_by_image.get(iid, []):
            names = obj.get("names") or [obj.get("name", "")]
            name = canon(names[0], obj_aliases) if names and names[0] else ""
            if name not in o2i:
                continue
            w, h = obj.get("w", 0), obj.get("h", 0)
            if w < min_box or h < min_box or len(objs) >= max_objects:
                continue
            id_map[obj["object_id"]] = len(objs)
            objs.append((o2i[name], obj["x"], obj["y"], w, h))
        rels = []
        for rel in rels_by_image.get(iid, []):
            pred = canon(rel.get("predicate", ""), rel_aliases)
            s = rel.get("subject", {}).get("object_id")
            o = rel.get("object", {}).get("object_id")
            if (pred in p2i and s in id_map and o in id_map
                    and len(rels) < max_rels):
                rels.append((id_map[s], p2i[pred], id_map[o]))
        if not objs:
            continue
        rows.append((iid, meta, objs, rels))
    if not rows:
        raise ValueError("empty split")

    N = len(rows)
    arr = {
        "image_ids": np.zeros(N, np.int64),
        "objects_per_image": np.zeros(N, np.int32),
        "relationships_per_image": np.zeros(N, np.int32),
        "object_names": np.zeros((N, max_objects), np.int32),
        "object_boxes": np.zeros((N, max_objects, 4), np.int32),
        "relationship_subjects": np.zeros((N, max_rels), np.int32),
        "relationship_predicates": np.zeros((N, max_rels), np.int32),
        "relationship_objects": np.zeros((N, max_rels), np.int32),
    }
    paths = []
    for i, (iid, meta, objs, rels) in enumerate(rows):
        arr["image_ids"][i] = iid
        arr["objects_per_image"][i] = len(objs)
        arr["relationships_per_image"][i] = len(rels)
        for j, (name, x, y, w, h) in enumerate(objs):
            arr["object_names"][i, j] = name
            arr["object_boxes"][i, j] = [x, y, w, h]
        for j, (s, p, o) in enumerate(rels):
            arr["relationship_subjects"][i, j] = s
            arr["relationship_predicates"][i, j] = p
            arr["relationship_objects"][i, j] = o
        base, filename = os.path.split(meta["url"])
        paths.append(os.path.join(os.path.basename(base), filename))
    return arr, paths


def main(args):
    import h5py

    with open(os.path.join(args.vg_dir, "image_data.json")) as f:
        images = json.load(f)
    image_meta = {im["image_id"]: im for im in images
                  if min(im["height"], im["width"]) >= args.min_image_size}

    splits_path = args.splits_json or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "canonicalsg2im_tpu", "data", "vg_splits.json")
    if os.path.exists(splits_path):
        with open(splits_path) as f:
            splits = json.load(f)
    else:
        ids = sorted(image_meta)
        n = len(ids)
        splits = {"train": ids[: int(0.8 * n)],
                  "val": ids[int(0.8 * n): int(0.9 * n)],
                  "test": ids[int(0.9 * n):]}

    obj_aliases = load_aliases(os.path.join(args.vg_dir, "object_alias.txt"))
    rel_aliases = load_aliases(os.path.join(args.vg_dir,
                                            "relationship_alias.txt"))
    with open(os.path.join(args.vg_dir, "objects.json")) as f:
        objects = json.load(f)
    with open(os.path.join(args.vg_dir, "relationships.json")) as f:
        relationships = json.load(f)

    vocab = build_vocab(objects, relationships, splits["train"], obj_aliases,
                        rel_aliases, args.min_object_instances,
                        args.min_relationship_instances)

    objects_by_image = {img["image_id"]: img["objects"] for img in objects}
    rels_by_image = {img["image_id"]: img["relationships"]
                     for img in relationships}

    os.makedirs(args.output_dir, exist_ok=True)
    for split, ids in splits.items():
        ids = [i for i in ids if i in image_meta]
        arr, paths = encode_split(ids, image_meta, objects_by_image,
                                  rels_by_image, vocab, obj_aliases,
                                  rel_aliases, args.max_objects_per_image,
                                  args.max_relationships_per_image,
                                  args.min_box_size)
        h5_path = os.path.join(args.output_dir, f"{split}.h5")
        with h5py.File(h5_path, "w") as h5:
            for name, a in arr.items():
                h5.create_dataset(name, data=a)
            dt = h5py.special_dtype(vlen=str)
            dset = h5.create_dataset("image_paths", (len(paths),), dtype=dt)
            for i, p in enumerate(paths):
                dset[i] = p
        print("wrote", h5_path, f"({arr['image_ids'].shape[0]} images)")

    vocab_path = os.path.join(args.output_dir, "vocab.json")
    with open(vocab_path, "w") as f:
        json.dump(vocab, f)
    print("wrote", vocab_path)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--vg_dir", default="datasets/vg")
    ap.add_argument("--output_dir", default="datasets/vg")
    ap.add_argument("--splits_json", default=None)
    ap.add_argument("--min_image_size", type=int, default=200)
    ap.add_argument("--min_object_instances", type=int, default=2000)
    ap.add_argument("--min_relationship_instances", type=int, default=500)
    ap.add_argument("--min_box_size", type=int, default=32)
    ap.add_argument("--max_objects_per_image", type=int, default=100)
    ap.add_argument("--max_relationships_per_image", type=int, default=100)
    main(ap.parse_args())
