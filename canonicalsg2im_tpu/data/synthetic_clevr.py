"""Synthetic packed-CLEVR dataset — random scenes, no image files needed.

TPU-native counterpart of the reference's `PackedGenCLEVRDataset` /
`PackedSynCLEVRDataset` (`sg2im/data/packed_clevr_dialog.py:337-788`):
random attributes, size-dependent random boxes (0.1 for small / 0.2 for
large), analytically derived spatial relations, and the full WSGC
canonicalization chain (location triplets -> dummy edges -> learned
converse/transitive augmentation). Used by training smoke paths, unit tests,
benchmarking, and the large-graph CLEVR generation flow
(`scripts/generate_clevr.py`).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from canonicalsg2im_tpu.data.canonicalize import (
    augment_triplets,
    dummy_triplets,
    location_triplets,
)
from canonicalsg2im_tpu.data.pipeline import SceneGraphSample
from canonicalsg2im_tpu.data.vocab import META_RELATIONS, build_clevr_vocab


class SyntheticClevrDataset:
    """Random CLEVR-style scenes with deterministic per-index generation.

    Each index owns an independent RNG stream, so scenes are reproducible and
    the dataset is trivially shardable across hosts. Optionally renders a
    procedural "image" (soft-splat of per-attribute colors) so the full
    GAN path can train without any real data on disk.
    """

    meta_relations = META_RELATIONS

    def __init__(self, num_samples: int = 10_000, *, min_objects: int = 3,
                 max_objects: int = 10, image_size=(64, 64), mask_size: int = 0,
                 include_dummies: bool = False, learned_converse: bool = False,
                 learned_transitivity: bool = False, learned_symmetry: bool = False,
                 converse_epsilon: float = 0.0,
                 render_images: bool = True, nested_fraction: float = 0.25,
                 seed: int = 0, mode: str = "train"):
        self.vocab = build_clevr_vocab()
        self.num_samples = num_samples
        self.min_objects = min_objects
        self.max_objects = max_objects
        self.image_size = tuple(image_size)
        self.mask_size = mask_size
        self.include_dummies = include_dummies
        self.learned_converse = learned_converse
        self.learned_transitivity = learned_transitivity
        self.learned_symmetry = learned_symmetry
        self.converse_epsilon = converse_epsilon
        self.render_images = render_images
        self.nested_fraction = nested_fraction
        self.seed = seed + (0 if mode == "train" else 1_000_003)
        P = len(self.vocab["pred_name_to_idx"])
        self.converse_candidates_weights: np.ndarray = np.zeros((P, P))
        self.attr_names = list(self.vocab["attributes"].keys())

    def __len__(self) -> int:
        return self.num_samples

    def _scene(self, rng: np.random.Generator):
        n = int(rng.integers(self.min_objects, self.max_objects + 1))
        attrs = np.stack(
            [rng.integers(1, len(self.vocab["attributes"][a]), size=n)
             for a in self.attr_names], axis=1
        ).astype(np.int32)  # (n, A)
        size_col = self.attr_names.index("size")
        small = self.vocab["attributes"]["size"]["small"]
        obj_size = np.where(attrs[:, size_col] == small, 0.1, 0.2)
        xy = rng.uniform(0.0, 1.0, size=(n, 2)) * (1.0 - obj_size[:, None])
        boxes = np.concatenate(
            [xy, obj_size[:, None], obj_size[:, None]], axis=1
        ).astype(np.float32)
        if n >= 2 and rng.uniform() < self.nested_fraction:
            # Nest one small object strictly inside a large one so the
            # __inside__/__surrounding__ relations occur (their REINFORCE
            # converse rows are unlearnable without signal). The containment
            # test uses the reference's x0/center convention
            # (base_dataset.py:46-49): child x0 > parent x0 AND child
            # x-"center" (x0 + w/2) < parent x-"center" — i.e. child x0 in
            # (parent x0, parent x0 + (wp - wc)/2).
            child, parent = rng.choice(n, size=2, replace=False)
            small = self.vocab["attributes"]["size"]["small"]
            large = [v for k, v in self.vocab["attributes"]["size"].items()
                     if k not in ("small", "__image__") and v != 0][0]
            attrs[child, size_col], attrs[parent, size_col] = small, large
            wc, wp = 0.1, 0.2
            obj_size[child], obj_size[parent] = wc, wp
            boxes[parent, 2:] = wp
            boxes[parent, :2] = rng.uniform(0.0, 1.0, size=2) * (1.0 - wp)
            margin = (wp - wc) / 2.0
            boxes[child, :2] = (boxes[parent, :2]
                                + rng.uniform(0.05, 0.95, size=2) * margin)
            boxes[child, 2:] = wc
        return attrs, boxes

    def _render(self, attrs: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        """Procedural image: each object paints a color keyed by its attribute
        ids into its box; later (larger-index) objects overwrite."""
        H, W = self.image_size
        img = np.full((H, W, 3), -1.0, dtype=np.float32)
        colors = (attrs[:, :3].astype(np.float32)
                  / np.array([3.0, 8.0, 2.0], dtype=np.float32)) * 2.0 - 1.0
        for i in range(attrs.shape[0]):
            x0, y0, w, h = boxes[i]
            xa, xb = int(x0 * W), min(W, int((x0 + w) * W) + 1)
            ya, yb = int(y0 * H), min(H, int((y0 + h) * H) + 1)
            img[ya:yb, xa:xb] = colors[i]
        return img

    def image_id_of(self, index: int) -> int:
        return index

    def render_image(self, index: int):
        """(image_id, image) for one index, independent of `render_images`
        (RotatingDevicePool segment uploads). Replays the same per-index rng
        stream as __getitem__, so the image is bit-identical to a
        loader-rendered one."""
        rng = np.random.default_rng((self.seed, index))
        attrs, boxes = self._scene(rng)
        return index, self._render(attrs, boxes)

    def __getitem__(self, index: int) -> SceneGraphSample:
        rng = np.random.default_rng((self.seed, index))
        attrs, boxes = self._scene(rng)
        n = attrs.shape[0]

        if self.include_dummies:
            attrs = np.concatenate([attrs, np.zeros((1, attrs.shape[1]), np.int32)])
            boxes = np.concatenate(
                [boxes, np.full((1, 4), -1.0, dtype=np.float32)]
            )
        centers = boxes[:, :2] + boxes[:, 2:] / 2.0
        real = np.any(boxes != -1.0, axis=-1)

        triplets = location_triplets(boxes, centers, real, self.vocab)
        if self.include_dummies:
            triplets += dummy_triplets(attrs.shape[0], attrs.shape[0] - 1, self.vocab)
        triplets, conv_counts, triplet_type = augment_triplets(
            triplets, self.vocab,
            learned_converse=self.learned_converse,
            learned_transitivity=self.learned_transitivity,
            learned_symmetry=self.learned_symmetry,
            converse_epsilon=self.converse_epsilon,
            converse_weights=self.converse_candidates_weights,
            rng=rng,
        )

        image = self._render(attrs[:n], boxes[:n]) if self.render_images else None
        masks = None
        if self.mask_size > 0:
            masks = np.ones((attrs.shape[0], self.mask_size, self.mask_size),
                            dtype=np.float32)
        return SceneGraphSample(
            image=image, objs=attrs, boxes=boxes,
            triplets=triplets.astype(np.int32),
            conv_counts=conv_counts,
            triplet_type=triplet_type.astype(np.int32),
            masks=masks, image_id=index,
        )
