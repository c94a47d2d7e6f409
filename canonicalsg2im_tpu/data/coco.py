"""COCO-Stuff scene-graph dataset (reference `sg2im/data/coco.py` and
`sg2im/data/packed_coco.py`).

Builds vocab from the instances + stuff category tables (category ids become
object ids, 0 = __image__), filters annotations by box area / whitelist /
'other', prunes images by object count, and constructs scene graphs on the
fly:

- packed mode: dense location triplets between all object pairs, each
  relation reduced to its minimal graph (packed_coco.py:362-383 via the shared
  canonicalization chain);
- sparse mode: one random neighbor per object with angle-based relation
  assignment, optionally folded to the converse-canonical form
  (coco.py:365-421).

Object centers are mask-weighted box centroids (packed_coco.py:338-353);
masks are decoded by the native codec in data/mask_codec.py. Images are
ImageNet-normalized as in the reference (packed_coco.py:268-270).

The reference hard-codes a 1024-entry val-id list to split val2017 into
val/test (packed_coco.py:12-90, applied as val = ids ∩ list / test =
ids − list in dataset_params.py:188-191). That list ships here as
``coco_val_ids.json`` and is the default split, so IoU/FID numbers are
comparable against reference checkpoints; ``val_split="hash"`` selects the
deterministic image_id-parity split instead.
"""
from __future__ import annotations

import json
import math
import os
from collections import defaultdict

import numpy as np

from canonicalsg2im_tpu.data.canonicalize import (
    augment_triplets,
    dummy_triplets,
    location_triplets,
)
from canonicalsg2im_tpu.data.mask_codec import seg_to_mask
from canonicalsg2im_tpu.data.pipeline import SceneGraphSample
from canonicalsg2im_tpu.data.vocab import META_RELATIONS, register_relations

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_image_imagenet(path, image_size):
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((image_size[1], image_size[0]),
                                      Image.BILINEAR)
        arr = np.asarray(im, dtype=np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def load_reference_val_ids():
    """The reference's hard-coded COCO val2017 val-id list
    (sg2im/data/packed_coco.py:12-90), shipped as split-definition data."""
    path = os.path.join(os.path.dirname(__file__), "coco_val_ids.json")
    with open(path) as f:
        return json.load(f)


def resize_mask_nearest(mask, size):
    h, w = mask.shape
    hi = (np.arange(size) * h // size).clip(0, h - 1)
    wi = (np.arange(size) * w // size).clip(0, w - 1)
    return mask[hi][:, wi]


class CocoSceneGraphDataset:
    meta_relations = META_RELATIONS

    def __init__(self, image_dir, instances_json, stuff_json, *,
                 packed: bool = True, partition: str = "train",
                 image_size=(64, 64), mask_size: int = 0,
                 min_object_size: float = 0.02, min_objects: int = 3,
                 max_objects: int = 8, include_other: bool = False,
                 instance_whitelist=None, stuff_whitelist=None,
                 include_dummies: bool = False, learned_converse: bool = False,
                 learned_transitivity: bool = False, learned_symmetry: bool = False,
                 converse_epsilon: float = 0.0,
                 use_converse: bool = False,
                 include_relationships: bool = True, max_samples=None,
                 canonical_sampling: bool = False, seed: int = 0,
                 val_split: str = "reference"):
        self.image_dir = image_dir
        self.image_size = tuple(image_size)
        self.packed = packed
        self.mask_size = mask_size if mask_size > 0 else 64
        self.return_masks = mask_size > 0
        self.include_dummies = include_dummies
        self.learned_converse = learned_converse
        self.learned_transitivity = learned_transitivity
        self.learned_symmetry = learned_symmetry
        self.converse_epsilon = converse_epsilon
        self.use_converse = use_converse
        self.include_relationships = include_relationships
        self.max_samples = max_samples
        # canonical_packed_coco's graph-variant augmentation
        # (canonical_packed_coco.py:366-404)
        self.canonical_sampling = canonical_sampling
        self.seed = seed

        with open(instances_json) as f:
            instances = json.load(f)
        with open(stuff_json) as f:
            stuff = json.load(f)

        self.image_meta = {}
        for im in instances["images"]:
            self.image_meta[im["id"]] = (im["file_name"],
                                         im["width"], im["height"])

        self.vocab = {"object_name_to_idx": {}}
        idx_to_name = {}
        for cat in instances["categories"] + stuff["categories"]:
            idx_to_name[cat["id"]] = cat["name"]
            self.vocab["object_name_to_idx"][cat["name"]] = cat["id"]

        # `is None` (not `or`): an explicit [] means "exclude this class of
        # objects entirely" — e.g. stuff_whitelist=[] drops stuff-derived
        # containment triplets for the converse basin-boundary ablations
        whitelist = set(instance_whitelist if instance_whitelist is not None
                        else [c["name"] for c in instances["categories"]])
        whitelist |= set(stuff_whitelist if stuff_whitelist is not None
                         else [c["name"] for c in stuff["categories"]])

        self.image_id_to_objects = defaultdict(list)
        ids_with_stuff = set()
        for source, anns in (("inst", instances["annotations"]),
                             ("stuff", stuff["annotations"])):
            for ann in anns:
                image_id = ann["image_id"]
                if source == "stuff":
                    ids_with_stuff.add(image_id)
                if image_id not in self.image_meta:
                    continue
                _, W, H = self.image_meta[image_id]
                _, _, w, h = ann["bbox"]
                name = idx_to_name.get(ann["category_id"])
                if (w * h / (W * H) > min_object_size and name in whitelist
                        and (name != "other" or include_other)):
                    self.image_id_to_objects[image_id].append(ann)

        self.vocab["object_name_to_idx"]["__image__"] = 0
        max_idx = max(self.vocab["object_name_to_idx"].values())
        names = ["NONE"] * (max_idx + 1)
        for name, idx in self.vocab["object_name_to_idx"].items():
            names[idx] = name
        self.vocab["object_idx_to_name"] = names

        self.image_ids = [
            iid for iid in self.image_meta
            if iid in ids_with_stuff
            and min_objects <= len(self.image_id_to_objects[iid]) <= max_objects
        ]
        if partition in ("val", "test"):
            if val_split == "reference":
                # the reference's hard-coded val-id split
                # (dataset_params.py:188-191): val keeps ids on the list,
                # test keeps the rest — order-preserved for determinism
                val_ids = set(load_reference_val_ids())
                if partition == "val":
                    self.image_ids = [i for i in self.image_ids
                                      if i in val_ids]
                else:
                    self.image_ids = [i for i in self.image_ids
                                      if i not in val_ids]
            else:  # 'hash': deterministic parity split
                keep = 0 if partition == "val" else 1
                self.image_ids = [i for i in self.image_ids if i % 2 == keep]

        register_relations(self.vocab)
        self.vocab["attributes"] = {"objects": self.vocab["object_name_to_idx"]}
        self.vocab["reverse_attributes"] = {
            "objects": {v: k for k, v in
                        self.vocab["object_name_to_idx"].items()}}
        P = len(self.vocab["pred_name_to_idx"])
        self.converse_candidates_weights = np.zeros((P, P))
        # DeviceImagePool flips this off once images are cached in HBM
        self.render_images = True

    def __len__(self):
        n = len(self.image_ids)
        return min(n, self.max_samples) if self.max_samples else n

    def _mask_centers(self, boxes, masks):
        centers = np.zeros((boxes.shape[0], 2), np.float32)
        M = masks.shape[-1]
        lin = (np.arange(M) + 0.0) / max(M - 1, 1)
        for i in range(boxes.shape[0]):
            x0, y0, w, h = boxes[i]
            m = masks[i] > 0
            if not m.any():
                centers[i] = [x0 + w / 2, y0 + h / 2]
                continue
            xs = x0 + lin[None, :] * w
            ys = y0 + lin[:, None] * h
            centers[i] = [np.broadcast_to(xs, (M, M))[m].mean(),
                          np.broadcast_to(ys, (M, M))[m].mean()]
        return centers

    def _sparse_triplets(self, boxes, centers, real, rng):
        """Random 1-neighbor angle-based relations (coco.py:365-421)."""
        p2i = self.vocab["pred_name_to_idx"]
        real_idx = np.nonzero(real)[0]
        triplets = []
        if len(real_idx) < 2 or not self.include_relationships:
            return triplets
        for cur in real_idx:
            choices = [o for o in real_idx if o != cur]
            other = int(rng.choice(choices))
            s, o = (int(cur), other) if rng.random() > 0.5 else (other, int(cur))
            sx0, sy0, sw, sh = boxes[s]
            scx, scy = sx0 + sw / 2, sy0 + sh / 2
            ox0, oy0, ow, oh = boxes[o]
            ocx, ocy = ox0 + ow / 2, oy0 + oh / 2
            d = centers[s] - centers[o]
            theta = math.atan2(d[1], d[0])
            surrounding = sx0 < ox0 and scx > ocx and sy0 < oy0 and scy > ocy
            inside = sx0 > ox0 and scx < ocx and sy0 > oy0 and scy < ocy
            if not self.use_converse:
                if surrounding:
                    p = "__surrounding__"
                elif inside:
                    p = "__inside__"
                elif theta >= 3 * math.pi / 4 or theta <= -3 * math.pi / 4:
                    p = "__left of__"
                elif -3 * math.pi / 4 <= theta < -math.pi / 4:
                    p = "__above__"
                elif -math.pi / 4 <= theta < math.pi / 4:
                    p = "__right of__"
                else:
                    p = "__below__"
            else:
                # converse-canonical: fold right->left, below->above by
                # swapping the endpoints (coco.py:406-421)
                if surrounding:
                    p = "__surrounding__"
                elif inside:
                    p = "__surrounding__"
                    s, o = o, s
                elif theta >= 3 * math.pi / 4 or theta <= -3 * math.pi / 4:
                    p = "__left of__"
                elif -3 * math.pi / 4 <= theta < -math.pi / 4:
                    p = "__above__"
                elif -math.pi / 4 <= theta < math.pi / 4:
                    p = "__left of__"
                    s, o = o, s
                else:
                    p = "__above__"
                    s, o = o, s
            triplets.append([s, p2i[p], o])
        return triplets

    def image_id_of(self, index: int) -> int:
        return int(self.image_ids[index])

    def render_image(self, index: int):
        """(image_id, image) for one index, independent of `render_images` —
        the RotatingDevicePool's segment-upload path (it renders images
        itself while the loader runs graph-only)."""
        image_id = self.image_ids[index]
        fname, _, _ = self.image_meta[image_id]
        return int(image_id), load_image_imagenet(
            os.path.join(self.image_dir, fname), self.image_size)

    def __getitem__(self, index: int) -> SceneGraphSample:
        image_id = self.image_ids[index]
        rng = np.random.default_rng((self.seed, image_id))
        fname, WW, HH = self.image_meta[image_id]
        image = (load_image_imagenet(os.path.join(self.image_dir, fname),
                                     self.image_size)
                 if self.render_images else None)

        objs, boxes, masks = [], [], []
        for ann in self.image_id_to_objects[image_id]:
            objs.append(ann["category_id"])
            x, y, w, h = ann["bbox"]
            boxes.append([x / WW, y / HH, w / WW, h / HH])
            full = seg_to_mask(ann["segmentation"], WW, HH)
            mx0, mx1 = int(round(x)), max(int(round(x)) + 1, int(round(x + w)))
            my0, my1 = int(round(y)), max(int(round(y)) + 1, int(round(y + h)))
            crop = full[my0:my1, mx0:mx1]
            if crop.size == 0:
                crop = np.zeros((1, 1), np.uint8)
            masks.append(resize_mask_nearest(crop, self.mask_size))

        if self.include_dummies:
            objs.append(0)
            boxes.append([-1, -1, -1, -1])
            masks.append(np.ones((self.mask_size, self.mask_size), np.uint8))

        objs_arr = np.asarray(objs, np.int32)[:, None]  # (O, 1) single attr
        boxes_arr = np.asarray(boxes, np.float32)
        masks_arr = np.stack(masks).astype(np.float32)
        centers = self._mask_centers(boxes_arr, masks_arr)
        real = objs_arr[:, 0] != 0

        if self.packed:
            triplets = location_triplets(boxes_arr, centers, real, self.vocab)
            if self.canonical_sampling:
                from canonicalsg2im_tpu.data.canonicalize import (
                    sample_canonical_graph)

                triplets = sample_canonical_graph(triplets, self.vocab, rng)
        else:
            triplets = self._sparse_triplets(boxes_arr, centers, real, rng)
        if self.include_dummies:
            triplets += dummy_triplets(len(objs), len(objs) - 1, self.vocab)
        triplets, conv_counts, triplet_type = augment_triplets(
            triplets, self.vocab, learned_converse=self.learned_converse,
            learned_transitivity=self.learned_transitivity,
            learned_symmetry=self.learned_symmetry,
            converse_epsilon=self.converse_epsilon,
            converse_weights=self.converse_candidates_weights, rng=rng)

        return SceneGraphSample(
            image=image, objs=objs_arr, boxes=boxes_arr,
            triplets=triplets.astype(np.int32), conv_counts=conv_counts,
            triplet_type=triplet_type.astype(np.int32),
            masks=masks_arr if self.return_masks else None,
            image_id=int(image_id))
