"""Equivalence tests: C++ canonicalizer (native/canonicalize.cpp) vs the
pure-numpy path in data/canonicalize.py.

The numpy path is the semantic reference (itself tested against golden
vectors from the upstream algorithms in test_graph_closure.py); the native
path must match it byte-for-byte on every deterministic part. Converse
sampling draws from a different RNG, so it is checked (a) exactly under
forced (near-one-hot) weights and (b) statistically under uniform weights.
"""
import numpy as np
import pytest

import canonicalsg2im_tpu.data.canonicalize as C
from canonicalsg2im_tpu.data.vocab import META_RELATIONS, build_clevr_vocab
from canonicalsg2im_tpu.graphs import (
    ORIGINAL_EDGE,
    SYMMETRIC_EDGE,
    TRANSITIVE_EDGE,
)
from canonicalsg2im_tpu.native.build import load_canonicalize

pytestmark = pytest.mark.skipif(
    load_canonicalize() is None, reason="native toolchain unavailable")

VOCAB = build_clevr_vocab()
P = len(VOCAB["pred_name_to_idx"])
NON_META = sorted(set(VOCAB["pred_name_to_idx"].values())
                  - {VOCAB["pred_name_to_idx"][p] for p in META_RELATIONS})


@pytest.fixture
def numpy_path(monkeypatch):
    """Call the same function with the native library disabled."""
    def call(fn, *a, **k):
        old = C._NATIVE
        C._NATIVE = False
        try:
            return fn(*a, **k)
        finally:
            C._NATIVE = old
    return call


def _segments(out, types):
    return {tag: sorted(map(tuple, out[types == tag].tolist()))
            for tag in (ORIGINAL_EDGE, SYMMETRIC_EDGE, TRANSITIVE_EDGE)}


def test_location_triplets_exact(numpy_path):
    rng = np.random.default_rng(0)
    for trial in range(100):
        O = int(rng.integers(2, 24))
        boxes = rng.uniform(0, 1, (O, 4)).astype(np.float32)
        boxes[:, 2:] *= 0.5
        if trial % 3 == 0:  # COCO-style independent mask centroids
            centers = rng.uniform(0, 1, (O, 2)).astype(np.float32)
        else:
            centers = (boxes[:, :2] + boxes[:, 2:] / 2).astype(np.float32)
        real = rng.uniform(size=O) > 0.2
        native = C.location_triplets(boxes, centers, real, VOCAB)
        ref = numpy_path(C.location_triplets, boxes, centers, real, VOCAB)
        assert native == [list(map(int, t)) for t in ref]


def test_location_triplets_native_active():
    assert C._native_lib() is not None


def _random_triplets(rng, with_meta=True):
    n_obj = int(rng.integers(2, 12))
    n_t = int(rng.integers(1, 30))
    preds = NON_META + ([VOCAB["pred_name_to_idx"]["__in_image__"]]
                        if with_meta else [])
    return np.stack([rng.integers(0, n_obj, n_t),
                     rng.choice(preds, n_t),
                     rng.integers(0, n_obj, n_t)], axis=1).tolist()


def test_augment_deterministic_parts_exact(numpy_path):
    rng = np.random.default_rng(1)
    for _ in range(50):
        trips = _random_triplets(rng)
        a = C.augment_triplets(trips, VOCAB, learned_transitivity=True,
                               learned_symmetry=True,
                               rng=np.random.default_rng(5))
        b = numpy_path(C.augment_triplets, trips, VOCAB,
                       learned_transitivity=True, learned_symmetry=True,
                       rng=np.random.default_rng(5))
        assert _segments(a[0], a[2]) == _segments(b[0], b[2])
        assert np.array_equal(a[1], b[1])  # all-zero conv_counts


def test_augment_forced_converse_exact(numpy_path):
    """Near-one-hot weights make the draw deterministic in both samplers."""
    rng = np.random.default_rng(2)
    for trial in range(30):
        trips = _random_triplets(rng, with_meta=False)
        w = np.full((P, P), -50.0)
        for r in NON_META:
            others = [c for c in NON_META if c != r]
            w[r, others[trial % len(others)]] = 50.0
        a = C.augment_triplets(trips, VOCAB, learned_converse=True,
                               learned_transitivity=True, converse_weights=w,
                               rng=np.random.default_rng(7))
        b = numpy_path(C.augment_triplets, trips, VOCAB, learned_converse=True,
                       learned_transitivity=True, converse_weights=w,
                       rng=np.random.default_rng(7))
        assert _segments(a[0], a[2]) == _segments(b[0], b[2])
        assert np.array_equal(a[1], b[1])


def test_augment_converse_distribution():
    """Uniform weights: every candidate (+ no-edge) drawn ~uniformly."""
    rel = NON_META[0]
    w = np.zeros((P, P))
    counts = np.zeros(P + 1)
    n_runs = 2000
    for s in range(n_runs):
        _, cc, _ = C.augment_triplets([[0, rel, 1]], VOCAB,
                                      learned_converse=True,
                                      converse_weights=w,
                                      rng=np.random.default_rng(s))
        counts += cc[rel]
    n_opts = len(NON_META)  # (len-1) candidates + no-edge
    active = counts[counts > 0]
    assert len(active) == n_opts
    expected = n_runs / n_opts
    assert np.all(np.abs(active - expected) < 5 * np.sqrt(expected))


def test_augment_seed_reproducible():
    trips = _random_triplets(np.random.default_rng(3), with_meta=False)
    w = np.random.default_rng(4).normal(size=(P, P))
    a = C.augment_triplets(trips, VOCAB, learned_converse=True,
                           converse_weights=w, rng=np.random.default_rng(11))
    b = C.augment_triplets(trips, VOCAB, learned_converse=True,
                           converse_weights=w, rng=np.random.default_rng(11))
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_empty_and_degenerate(numpy_path):
    out, cc, tt = C.augment_triplets([], VOCAB, learned_transitivity=True)
    assert out.shape == (0, 3) and tt.shape == (0,)
    # single real object -> no location triplets
    boxes = np.array([[0.1, 0.1, 0.3, 0.3]], dtype=np.float32)
    centers = boxes[:, :2] + boxes[:, 2:] / 2
    assert C.location_triplets(boxes, centers, np.array([True]), VOCAB) == []
