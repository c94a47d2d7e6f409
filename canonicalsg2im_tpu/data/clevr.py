"""CLEVR-Dialog dataset (reference `sg2im/data/packed_clevr_dialog.py:86-250`
and `sg2im/data/clevr_dialog.py`).

Loads CLEVR scenes JSON (+ images), derives GT boxes analytically from the 3D
coordinates (`extract_bounding_boxes`, packed_clevr_dialog.py:21-77), builds
dense location triplets, and runs the WSGC canonicalization chain. Requires
the CLEVR_Dialog data layout on disk:

  <base_path>/scenes/CLEVR_<mode>_scenes.json
  <base_path>/images/<split>/<image_filename>
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
from canonicalsg2im_tpu.data.pipeline import SceneGraphSample
from canonicalsg2im_tpu.data.vocab import META_RELATIONS, build_clevr_vocab


def extract_bounding_boxes(scene):
    """Analytic boxes from CLEVR 3D coords (packed_clevr_dialog.py:21-77).
    Returns lists (x, y, w, h) in [0, 1] (image plane 480x320)."""
    objs = scene["objects"]
    rotation = scene["directions"]["right"]
    xs, ys, ws, hs = [], [], [], []
    for obj in objs:
        x, y, _ = obj["pixel_coords"]
        x1, y1, z1 = obj["3d_coords"]
        cos_theta, sin_theta, _ = rotation
        x1 = x1 * cos_theta + y1 * sin_theta
        y1 = x1 * -sin_theta + y1 * cos_theta

        height_d = 6.9 * z1 * (15 - y1) / 2.0
        height_u = height_d
        width_l = height_d
        width_r = height_d
        if obj["shape"] == "cylinder":
            d = 9.4 + y1
            h = 6.4
            s = z1
            height_u *= (s * (h / d + 1)) / ((s * (h / d + 1))
                                             - (s * (h - s) / d))
            height_d = height_u * (h - s + d) / (h + s + d)
            width_l *= 11 / (10 + y1)
            width_r = width_l
        if obj["shape"] == "cube":
            height_u *= 1.3 * 10 / (10 + y1)
            height_d = height_u
            width_l = height_u
            width_r = height_u

        y_min = (y - height_d) / 320.0
        y_max = (y + height_u) / 320.0
        x_max = (x + width_r) / 480.0
        x_min = (x - width_l) / 480.0
        xs.append(x_min)
        ys.append(y_min)
        hs.append(y_max - y_min)
        ws.append(x_max - x_min)
    return xs, ys, ws, hs


def load_image(path, image_size):
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((image_size[1], image_size[0]),
                                      Image.BILINEAR)
        arr = np.asarray(im, dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0  # encode_image: (x - .5) / .5


class ClevrDialogDataset:
    meta_relations = META_RELATIONS

    def __init__(self, base_path: str, mode: str = "train", *, packed: bool = True,
                 image_size=(64, 64), mask_size: int = 0,
                 min_objects: int = 0, max_objects: int = 1000,
                 include_dummies: bool = False, learned_converse: bool = False,
                 learned_transitivity: bool = False, learned_symmetry: bool = False,
                 converse_epsilon: float = 0.0,
                 dense_scenes: bool = False,
                 max_samples=None):
        self.vocab = build_clevr_vocab()
        self.image_dir = os.path.join(base_path, "images")
        self.image_size = tuple(image_size)
        self.mask_size = mask_size
        self.include_dummies = include_dummies
        self.learned_converse = learned_converse
        self.learned_transitivity = learned_transitivity
        self.learned_symmetry = learned_symmetry
        self.converse_epsilon = converse_epsilon
        self.max_samples = max_samples
        self.mode = mode
        self.packed = packed
        P = len(self.vocab["pred_name_to_idx"])
        self.converse_candidates_weights = np.zeros((P, P))
        # DeviceImagePool flips this off once images are cached in HBM
        self.render_images = True

        if not packed:
            # sparse CLEVR-Dialog mode keeps CLEVR's annotated directional
            # relations as first-class predicates (clevr_dialog.py:96-98)
            for p in ("right", "behind", "front", "left"):
                if p not in self.vocab["pred_name_to_idx"]:
                    self.vocab["pred_name_to_idx"][p] = len(
                        self.vocab["pred_idx_to_name"])
                    self.vocab["pred_idx_to_name"].append(p)
            P = len(self.vocab["pred_name_to_idx"])
            self.converse_candidates_weights = np.zeros((P, P))

        scenes_path = os.path.join(base_path, "scenes",
                                   f"CLEVR_{mode}_scenes.json")
        with open(scenes_path) as f:
            self.scenes = json.load(f)["scenes"]
        if dense_scenes:
            self.scenes = [s for s in self.scenes
                           if min_objects < len(s["objects"]) < max_objects]
        self.attr_names = list(self.vocab["attributes"])

    def __len__(self):
        n = len(self.scenes)
        return min(n, self.max_samples) if self.max_samples else n

    def image_id_of(self, index: int) -> int:
        return int(self.scenes[index].get("image_index", index))

    def render_image(self, index: int):
        """(image_id, image) for one index, independent of `render_images`
        (RotatingDevicePool segment uploads). Raises if the scene has no
        on-disk image — a pool cannot be built for such datasets."""
        sg = self.scenes[index]
        image_id = sg.get("image_index", index)
        fname = sg.get("image_filename")
        if fname:
            path = os.path.join(self.image_dir, sg.get("split", self.mode),
                                fname)
            if os.path.exists(path):
                return int(image_id), load_image(path, self.image_size)
        raise ValueError(f"scene {index} has no on-disk image; cannot build "
                         "a device image pool for this CLEVR dataset")

    def __getitem__(self, index: int) -> SceneGraphSample:
        rng = np.random.default_rng((1234, index))
        sg = self.scenes[index]
        image_id = sg.get("image_index", index)

        attrs = np.stack(
            [[self.vocab["attributes"][a][obj[a]] for obj in sg["objects"]]
             for a in self.attr_names], axis=1
        ).astype(np.int32) if sg["objects"] else np.zeros((0, 4), np.int32)

        xs, ys, ws, hs = extract_bounding_boxes(sg)
        boxes = np.stack([xs, ys, ws, hs], axis=1).astype(np.float32)

        image = None
        fname = sg.get("image_filename")
        if fname and self.render_images:
            path = os.path.join(self.image_dir, sg.get("split", self.mode),
                                fname)
            if os.path.exists(path):
                image = load_image(path, self.image_size)

        if self.include_dummies:
            attrs = np.concatenate([attrs, np.zeros((1, attrs.shape[1]),
                                                    np.int32)])
            boxes = np.concatenate([boxes, np.full((1, 4), -1.0, np.float32)])

        centers = boxes[:, :2] + boxes[:, 2:] / 2.0
        real = np.any(boxes != -1.0, axis=-1)
        if self.packed:
            triplets = location_triplets(boxes, centers, real, self.vocab)
        else:
            # annotated directional triplets: relationships[rel][o1] lists the
            # objects o2 with (o2, rel, o1) — clevr_dialog.py:289-297
            triplets = []
            p2i = self.vocab["pred_name_to_idx"]
            for rel, per_obj in sg.get("relationships", {}).items():
                if rel not in p2i:
                    continue
                for o1, others in enumerate(per_obj):
                    for o2 in others:
                        triplets.append([int(o2), p2i[rel], o1])
        if self.include_dummies:
            triplets += dummy_triplets(attrs.shape[0], attrs.shape[0] - 1,
                                       self.vocab)
        triplets, conv_counts, triplet_type = augment_triplets(
            triplets, self.vocab, learned_converse=self.learned_converse,
            learned_transitivity=self.learned_transitivity,
            learned_symmetry=self.learned_symmetry,
            converse_epsilon=self.converse_epsilon,
            converse_weights=self.converse_candidates_weights, rng=rng)

        return SceneGraphSample(
            image=image, objs=attrs, boxes=boxes,
            triplets=triplets.astype(np.int32), conv_counts=conv_counts,
            triplet_type=triplet_type.astype(np.int32), masks=None,
            image_id=int(image_id))
