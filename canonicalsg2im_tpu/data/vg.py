"""Visual Genome scene-graph dataset (reference `sg2im/data/vg.py` and
`sg2im/data/packed_vg.py`).

Reads the HDF5 produced by scripts/preprocess_vg.py plus vocab.json.
Sparse mode samples up to max_objects relationship participants (plus
orphans); packed mode keeps all objects of dense scenes (>= min_objects) and
adds dense location triplets on top of the human-annotated ones
(packed_vg.py:139-142). Human predicates keep their annotated ids; the meta +
augmented relations are registered on top of the VG predicate vocab.
"""
from __future__ import annotations

import json
import os

import numpy as np

from canonicalsg2im_tpu.data.canonicalize import (
    augment_triplets,
    dummy_triplets,
    location_triplets,
)
from canonicalsg2im_tpu.data.clevr import load_image
from canonicalsg2im_tpu.data.pipeline import SceneGraphSample
from canonicalsg2im_tpu.data.vocab import META_RELATIONS, register_relations


class VGSceneGraphDataset:
    meta_relations = META_RELATIONS

    def __init__(self, h5_path, image_dir, vocab_json, *, packed: bool = False,
                 image_size=(256, 256), mask_size: int = 0,
                 max_objects: int = 10, min_objects: int = 0,
                 use_orphaned_objects: bool = True,
                 include_relationships: bool = True,
                 include_dummies: bool = False, learned_converse: bool = False,
                 learned_transitivity: bool = False, learned_symmetry: bool = False,
                 converse_epsilon: float = 0.0,
                 max_samples=None,
                 seed: int = 0):
        import h5py

        self.image_dir = image_dir
        self.image_size = tuple(image_size)
        self.packed = packed
        self.max_objects = max_objects
        self.min_objects = min_objects
        self.use_orphaned_objects = use_orphaned_objects
        self.include_relationships = include_relationships
        self.include_dummies = include_dummies
        self.learned_converse = learned_converse
        self.learned_transitivity = learned_transitivity
        self.learned_symmetry = learned_symmetry
        self.converse_epsilon = converse_epsilon
        self.max_samples = max_samples
        self.seed = seed

        with open(vocab_json) as f:
            self.vocab = json.load(f)
        register_relations(self.vocab)
        self.vocab["attributes"] = {"objects": self.vocab["object_name_to_idx"]}
        self.vocab["reverse_attributes"] = {
            "objects": {v: k for k, v in
                        self.vocab["object_name_to_idx"].items()}}

        self.data = {}
        with h5py.File(h5_path, "r") as f:
            for k, v in f.items():
                if k == "image_paths":
                    self.image_paths = [
                        p.decode() if isinstance(p, bytes) else str(p)
                        for p in np.asarray(v)]
                else:
                    self.data[k] = np.asarray(v)

        keep = np.arange(len(self.image_paths))
        if self.min_objects > 0:
            keep = np.nonzero(
                self.data["objects_per_image"] >= self.min_objects)[0]
        self.index_map = keep

        P = len(self.vocab["pred_name_to_idx"])
        self.converse_candidates_weights = np.zeros((P, P))
        # DeviceImagePool flips this off once images are cached in HBM
        self.render_images = True

    def __len__(self):
        n = len(self.index_map)
        return min(n, self.max_samples) if self.max_samples else n

    def image_id_of(self, idx: int) -> int:
        path = self.image_paths[int(self.index_map[idx])]
        return int(os.path.basename(path).split(".")[0])

    def render_image(self, idx: int):
        """(image_id, image) for one index, independent of `render_images`
        (RotatingDevicePool segment uploads)."""
        index = int(self.index_map[idx])
        path = self.image_paths[index]
        image_id = int(os.path.basename(path).split(".")[0])
        return image_id, load_image(os.path.join(self.image_dir, path),
                                    self.image_size)

    def __getitem__(self, idx: int) -> SceneGraphSample:
        index = int(self.index_map[idx])
        rng = np.random.default_rng((self.seed, index))
        path = self.image_paths[index]
        image_id = int(os.path.basename(path).split(".")[0])
        image = (load_image(os.path.join(self.image_dir, path),
                            self.image_size)
                 if self.render_images else None)
        from PIL import Image as PILImage

        with PILImage.open(os.path.join(self.image_dir, path)) as im:
            WW, HH = im.size

        n_obj = int(self.data["objects_per_image"][index])
        n_rel = int(self.data["relationships_per_image"][index])
        subs = self.data["relationship_subjects"][index, :n_rel]
        preds = self.data["relationship_predicates"][index, :n_rel]
        objs_r = self.data["relationship_objects"][index, :n_rel]

        if self.packed:
            obj_idxs = list(range(n_obj))
        else:
            with_rels = sorted(set(subs.tolist()) | set(objs_r.tolist()))
            without = [i for i in range(n_obj) if i not in set(with_rels)]
            obj_idxs = list(with_rels)
            if len(obj_idxs) > self.max_objects - 1:
                obj_idxs = list(rng.choice(obj_idxs, self.max_objects,
                                           replace=False))
            elif len(obj_idxs) < self.max_objects - 1 and self.use_orphaned_objects:
                add = min(self.max_objects - 1 - len(obj_idxs), len(without))
                if add:
                    obj_idxs += list(rng.choice(without, add, replace=False))

        O = len(obj_idxs) + (1 if self.include_dummies else 0)
        objs = np.zeros((O, 1), np.int32)
        boxes = np.full((O, 4), -1.0, np.float32)
        mapping = {}
        for i, oi in enumerate(obj_idxs):
            objs[i, 0] = self.data["object_names"][index, oi]
            x, y, w, h = self.data["object_boxes"][index, oi].tolist()
            boxes[i] = [x / WW, y / HH, w / WW, h / HH]
            mapping[int(oi)] = i
        if self.include_dummies:
            objs[O - 1, 0] = self.vocab["object_name_to_idx"]["__image__"]

        triplets = []
        if self.include_relationships:
            for r in range(n_rel):
                s = mapping.get(int(subs[r]))
                o = mapping.get(int(objs_r[r]))
                if s is not None and o is not None:
                    triplets.append([s, int(preds[r]), o])
        if self.packed:
            centers = boxes[:, :2] + boxes[:, 2:] / 2.0
            real = np.any(boxes != -1.0, axis=-1)
            triplets += location_triplets(boxes, centers, real, self.vocab)
        if self.include_dummies:
            triplets += dummy_triplets(O, O - 1, self.vocab)
        triplets, conv_counts, triplet_type = augment_triplets(
            triplets, self.vocab, learned_converse=self.learned_converse,
            learned_transitivity=self.learned_transitivity,
            learned_symmetry=self.learned_symmetry,
            converse_epsilon=self.converse_epsilon,
            converse_weights=self.converse_candidates_weights, rng=rng)

        return SceneGraphSample(
            image=image, objs=objs, boxes=boxes,
            triplets=triplets.astype(np.int32), conv_counts=conv_counts,
            triplet_type=triplet_type.astype(np.int32), masks=None,
            image_id=image_id)
