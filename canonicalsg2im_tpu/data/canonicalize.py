"""Host-side scene-graph canonicalization (dense location triplets, learned
converse/transitive augmentation, dummy edges).

This is the dataset-side half of WSGC, mirroring
`sg2im/data/base_dataset.py:35-150` but vectorized: the O(O^2) pairwise
spatial-relation assignment is a handful of NumPy broadcasts instead of a
Python double loop, and the per-relation minimal reduction uses the
boolean-matmul closure of :mod:`canonicalsg2im_tpu.graphs.closure`.
"""
from __future__ import annotations

import ctypes
import os
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

_NATIVE = None  # None = not probed, False = unavailable/disabled


def _native_lib():
    """The C++ canonicalizer (native/canonicalize.cpp) — the per-sample
    numpy path is many tiny GIL-bound allocations (~1.5 ms/scene, the
    measured layout-stage host bottleneck); the native path is ~microseconds.
    Disable with CSG2IM_NATIVE_CANON=0."""
    global _NATIVE
    if _NATIVE is None:
        if os.environ.get("CSG2IM_NATIVE_CANON", "1") == "0":
            _NATIVE = False
        else:
            from canonicalsg2im_tpu.native.build import load_canonicalize

            _NATIVE = load_canonicalize() or False
    return _NATIVE or None


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


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

    lib = _native_lib()
    if lib is not None:
        b = np.ascontiguousarray(boxes, dtype=np.float32)
        c = np.ascontiguousarray(obj_centers, dtype=np.float32)
        r = np.ascontiguousarray(real_mask, dtype=np.uint8)
        rel_ids = np.asarray([p2i[n] for n in AUGMENTED_RELATIONS],
                             dtype=np.int32)
        cap = 2 * O * O + 8
        out = np.empty((cap, 3), dtype=np.int32)
        n = lib.location_triplets_minimal(
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            r.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            O, _i32p(rel_ids), _i32p(out), cap)
        if n >= 0:
            return out[:n].astype(np.int64).tolist()
        # overflow / too many nodes: fall through to the numpy path

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


def _native_augment(lib, triplets, P, non_meta, meta, learned_converse,
                    learned_transitivity, learned_symmetry, converse_weights,
                    rng):
    """C++ fast path for :func:`augment_triplets`. Deterministic parts are
    byte-identical to the numpy path (outputs compared per segment as sorted
    sets in tests); converse draws use the library's own RNG, seeded from one
    draw of ``rng`` so runs stay reproducible. Returns None on overflow."""
    trip = np.ascontiguousarray(np.asarray(triplets, dtype=np.int32)
                                .reshape(-1, 3))
    T = trip.shape[0]
    nm = np.asarray(non_meta, dtype=np.int32)
    mt = np.asarray(meta, dtype=np.int32)
    if learned_converse:
        w = np.ascontiguousarray(converse_weights, dtype=np.float64)
    else:
        w = np.zeros((P, P), dtype=np.float64)
    seed = int((rng or np.random.default_rng()).integers(0, 2**63 - 1))
    conv_counts = np.zeros((P, P + 1), dtype=np.float32)

    cap = 4 * max(T, 1) + 1024
    for _ in range(4):
        out = np.empty((cap, 3), dtype=np.int32)
        out_types = np.empty((cap,), dtype=np.int32)
        n = lib.augment_triplets(
            _i32p(trip), T, P, _i32p(nm), len(nm), _i32p(mt), len(mt),
            int(learned_converse), int(learned_transitivity),
            int(learned_symmetry),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_uint64(seed), _i32p(out), _i32p(out_types),
            conv_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap)
        if n >= 0:
            return (out[:n].astype(np.int64), conv_counts,
                    out_types[:n].astype(np.int64))
        cap *= 4
    return None


def augment_triplets(
    triplets: list,
    vocab: dict,
    learned_converse: bool = False,
    learned_transitivity: bool = False,
    learned_symmetry: bool = False,
    converse_weights: Optional[np.ndarray] = None,
    rng: np.random.Generator | None = None,
    converse_epsilon: float = 0.0,
):
    """The reference's `add_learnt_triplets` (base_dataset.py:89-139).

    Per non-meta relation: keep the originals, optionally sample converse
    edges from the learned weights (tallying ``conv_counts`` for REINFORCE),
    then optionally tag every missing closure edge as TRANSITIVE. Meta-relation
    triplets ride through untouched.

    ``converse_epsilon`` > 0 enables the beyond-reference ε-exploration in
    the converse sampler (see graphs/converse.py::sample_converse_triplets)
    and forces the Python sampling path — the C++ fast path implements the
    reference semantics only.

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
    if learned_converse:
        assert converse_weights is not None, "learned_converse needs weights"

    lib = _native_lib() if converse_epsilon <= 0.0 else None
    if lib is not None:
        res = _native_augment(
            lib, triplets, P, sorted(non_meta), sorted(meta),
            learned_converse, learned_transitivity, learned_symmetry,
            converse_weights, rng)
        if res is not None:
            return res

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
                conv_counts, rng=rng, epsilon=converse_epsilon)
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
