"""Host-side scene-graph canonicalization (dense location triplets, learned
converse/transitive augmentation, dummy edges).

This is the dataset-side half of WSGC, mirroring
`sg2im/data/base_dataset.py:35-150` but vectorized: the O(O^2) pairwise
spatial-relation assignment is a handful of NumPy broadcasts instead of a
Python double loop, and the per-relation minimal reduction uses the
boolean-matmul closure of :mod:`canonicalsg2im_tpu.graphs.closure`.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from canonicalsg2im_tpu.graphs import (
    ORIGINAL_EDGE,
    SYMMETRIC_EDGE,
    TRANSITIVE_EDGE,
    get_current_and_transitive_triplets,
    get_minimal_and_transitive_triplets,
    get_symmetric_triplets,
    sample_converse_triplets,
    triplets_to_minimal,
)
from canonicalsg2im_tpu.data.vocab import AUGMENTED_RELATIONS, META_RELATIONS


def location_triplets(
    boxes: np.ndarray,
    obj_centers: np.ndarray,
    real_mask: np.ndarray,
    vocab: dict,
) -> list:
    """Dense spatial relations between all real-object pairs, each relation
    reduced to its minimal graph (base_dataset.py:35-87), vectorized.

    Args:
      boxes: (O, 4) [x0, y0, w, h] in [0, 1].
      obj_centers: (O, 2) box centers.
      real_mask: (O,) bool — which rows are real (non-dummy, non-padding).
    """
    O = boxes.shape[0]
    real = np.nonzero(real_mask)[0]
    if len(real) < 2:
        return []
    p2i = vocab["pred_name_to_idx"]

    b = boxes[real]
    x0, y0 = b[:, 0], b[:, 1]
    # the reference's "x1,y1" are centers: x0 + w/2 (base_dataset.py:46-49)
    cx, cy = b[:, 0] + b[:, 2] / 2.0, b[:, 1] + b[:, 3] / 2.0
    centers = obj_centers[real]

    # pairwise (s, o) grids over real objects
    def col(v):
        return v[:, None]

    surrounding = (col(x0) < x0) & (col(cx) > cx) & (col(y0) < y0) & (col(cy) > cy)
    inside = (col(x0) > x0) & (col(cx) < cx) & (col(y0) > y0) & (col(cy) < cy)
    dx = col(centers[:, 0]) - centers[:, 0]
    dy = col(centers[:, 1]) - centers[:, 1]
    neither = ~(surrounding | inside)
    rels = {
        "__surrounding__": surrounding,
        "__inside__": inside,
        "__right of__": neither & (dx > 0),
        "__left of__": neither & (dx < 0),
        "__below__": neither & (dy > 0),
        "__above__": neither & (dy < 0),
    }
    eye = np.eye(len(real), dtype=bool)

    triplets: list = []
    for name in AUGMENTED_RELATIONS:
        adj = rels[name] & ~eye
        s_idx, o_idx = np.nonzero(adj)
        if len(s_idx) == 0:
            continue
        p = p2i[name]
        rel_triplets = np.stack(
            [real[s_idx], np.full(len(s_idx), p, dtype=np.int64), real[o_idx]], axis=1
        )
        triplets.extend(np.asarray(triplets_to_minimal(rel_triplets)).tolist())
    return triplets


def dummy_triplets(num_objects: int, image_idx: int, vocab: dict) -> list:
    """__in_image__ edges from every object to the __image__ node
    (base_dataset.py:141-150)."""
    in_image = vocab["pred_name_to_idx"]["__in_image__"]
    return [[i, in_image, image_idx] for i in range(num_objects) if i != image_idx]


def sample_canonical_graph(triplets, vocab,
                           rng: np.random.Generator | None = None):
    """Random canonical-equivalent graph sampling — the data augmentation of
    the reference's `CanonicalPackedCocoSceneGraphDataset.sample_graph`
    (sg2im/data/canonical_packed_coco.py:366-404).

    Per converse pair (below/above, left/right, inside/surrounding) one
    direction is randomly dropped (or neither), each relation is reduced to
    its minimal graph, and a random subset of its transitive closure edges is
    re-added half the time — producing semantically equivalent graph variants.
    """
    if rng is None:
        rng = np.random.default_rng()
    if len(triplets) == 0:
        return []
    triplets_arr = np.unique(np.asarray(triplets, dtype=np.int64), axis=0)
    p2i = vocab["pred_name_to_idx"]
    i2p = vocab["pred_idx_to_name"]
    dropped = {
        rng.choice(["__below__", "__above__", None]),
        rng.choice(["__left of__", "__right of__", None]),
        rng.choice(["__inside__", "__surrounding__", None]),
    }
    meta = {p2i[p] for p in META_RELATIONS}
    non_meta = set(p2i.values()) - meta

    out: list = []
    for rel in non_meta:
        if i2p[rel] in dropped:
            continue
        rel_triplets = triplets_arr[triplets_arr[:, 1] == rel]
        if len(rel_triplets) == 0:
            continue
        if i2p[rel] in AUGMENTED_RELATIONS:
            minimal, transitive = get_minimal_and_transitive_triplets(rel_triplets)
        else:
            minimal, transitive = get_current_and_transitive_triplets(rel_triplets)
        out.extend(np.asarray(minimal).tolist())
        if rng.integers(0, 2) and len(transitive) > 0:
            mask = rng.integers(0, 2, size=len(transitive)).astype(bool)
            out.extend(np.asarray(transitive)[mask].tolist())
    for rel in meta:
        out.extend(triplets_arr[triplets_arr[:, 1] == rel].tolist())
    return out


def augment_triplets(
    triplets: list,
    vocab: dict,
    learned_converse: bool = False,
    learned_transitivity: bool = False,
    learned_symmetry: bool = False,
    converse_weights: Optional[np.ndarray] = None,
    rng: np.random.Generator | None = None,
):
    """The reference's `add_learnt_triplets` (base_dataset.py:89-139).

    Per non-meta relation: keep the originals, optionally sample converse
    edges from the learned weights (tallying ``conv_counts`` for REINFORCE),
    then optionally tag every missing closure edge as TRANSITIVE. Meta-relation
    triplets ride through untouched.

    Returns (triplets (T,3) int64, conv_counts (P, P+1) float32, triplet_type (T,)).
    """
    if rng is None:
        rng = np.random.default_rng()
    P = len(vocab["pred_name_to_idx"])
    conv_counts = np.zeros((P, P + 1), dtype=np.float32)
    meta = {vocab["pred_name_to_idx"][p] for p in META_RELATIONS}
    non_meta = set(vocab["pred_name_to_idx"].values()) - meta

    if len(triplets) == 0:
        return (np.zeros((0, 3), dtype=np.int64), conv_counts,
                np.zeros((0,), dtype=np.int64))
    triplets_arr = np.unique(np.asarray(triplets, dtype=np.int64), axis=0)

    new_triplets: list = []
    for rel in non_meta:
        rel_triplets = triplets_arr[triplets_arr[:, 1] == rel]
        if len(rel_triplets) == 0:
            continue
        new_triplets.extend(rel_triplets.tolist())
        if learned_converse:
            assert converse_weights is not None, "learned_converse needs weights"
            converse, conv_counts = sample_converse_triplets(
                rel_triplets, sorted(non_meta - {rel}), converse_weights,
                conv_counts, rng=rng)
            new_triplets.extend([list(map(int, t)) for t in converse])

    # symmetric-edge augmentation (PackedSynCLEVR add_learnt_triplets,
    # packed_clevr_dialog.py:744-747): reversed copies tagged SYMMETRIC_EDGE.
    # Note the GCN's soft confidence zeroes this tag's messages unless a
    # symmetry weight is learned — faithfully vestigial, like the reference.
    all_symmetric: list = []
    if learned_symmetry and new_triplets:
        arr = np.asarray(new_triplets, dtype=np.int64)
        for rel in non_meta:
            rel_triplets = arr[arr[:, 1] == rel]
            if len(rel_triplets):
                all_symmetric.extend(
                    np.asarray(get_symmetric_triplets(rel_triplets)).tolist())

    all_transitive: list = []
    if learned_transitivity and new_triplets:
        arr = np.asarray(new_triplets, dtype=np.int64)
        for rel in non_meta:
            rel_triplets = arr[arr[:, 1] == rel]
            if len(rel_triplets) == 0:
                continue
            _, transitive = get_current_and_transitive_triplets(rel_triplets)
            all_transitive.extend(np.asarray(transitive).tolist())

    for rel in meta:
        new_triplets.extend(triplets_arr[triplets_arr[:, 1] == rel].tolist())

    if new_triplets:
        out = np.unique(np.asarray(new_triplets, dtype=np.int64), axis=0)
    else:
        out = np.zeros((0, 3), dtype=np.int64)
    triplet_type = [ORIGINAL_EDGE] * len(out)
    if all_symmetric:
        out = np.concatenate([out, np.asarray(all_symmetric, dtype=np.int64)], axis=0)
        triplet_type += [SYMMETRIC_EDGE] * len(all_symmetric)
    if all_transitive:
        out = np.concatenate([out, np.asarray(all_transitive, dtype=np.int64)], axis=0)
        triplet_type += [TRANSITIVE_EDGE] * len(all_transitive)
    return out, conv_counts, np.asarray(triplet_type, dtype=np.int64)
