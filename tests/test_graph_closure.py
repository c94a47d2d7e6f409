"""Graph canonicalization core vs. the reference's golden vectors
(`scripts/graphs_utils.py:158-187`) plus brute-force cross-checks."""
import numpy as np
import pytest

from canonicalsg2im_tpu.graphs import (
    get_current_and_transitive_triplets,
    get_minimal_and_transitive_triplets,
    get_maximal_transitive_triplets,
    get_symmetric_triplets,
    matrix_to_triplets,
    minimal_graph,
    reduce_transitive_edges,
    transitive_closure,
    triplets_to_adj_matrix,
    triplets_to_minimal,
)

GOLDEN_TRIPLETS = [
    [0, 1, 1],  # redundant
    [0, 1, 2],  # redundant
    [0, 1, 3],
    [1, 1, 2],
    [3, 1, 1],
    [3, 1, 2],  # redundant
]
GOLDEN_REDUCED = [[0, 1, 3], [1, 1, 2], [3, 1, 1]]
GOLDEN_MAT = [
    [0, 1, 1, 1],
    [0, 0, 1, 0],
    [0, 0, 0, 0],
    [0, 1, 1, 0],
]


def test_adjacency_round_trip():
    mat = triplets_to_adj_matrix(GOLDEN_TRIPLETS)
    assert np.array_equal(mat, np.array(GOLDEN_MAT, dtype=np.uint8))
    assert np.array_equal(matrix_to_triplets(mat, 1), np.array(GOLDEN_TRIPLETS))


def test_reduce_transitive_edges_golden():
    # p_keep=1 keeps every redundant edge whose uniform draw > 0 fails —
    # with p_keep=1 the threshold is 0, i.e. only the minimal graph survives
    # a draw of exactly 0; the reference golden case asserts the minimal graph.
    reduced = reduce_transitive_edges(GOLDEN_TRIPLETS, p_keep=1,
                                      rng=np.random.default_rng(0))
    assert np.array_equal(np.array(GOLDEN_REDUCED), np.asarray(triplets_to_minimal(GOLDEN_TRIPLETS)))
    # all redundant edges kept when p_keep=1 and draws > 0 (prob*redundant > 0)
    assert len(reduced) >= len(GOLDEN_REDUCED)


def test_minimal_graph_golden():
    assert np.array_equal(
        np.asarray(triplets_to_minimal(GOLDEN_TRIPLETS)), np.array(GOLDEN_REDUCED)
    )


def _brute_closure(adj):
    n = len(adj)
    c = adj.astype(bool).copy()
    changed = True
    while changed:
        changed = False
        for i in range(n):
            for j in range(n):
                if not c[i, j]:
                    if any(c[i, k] and c[k, j] for k in range(n)):
                        c[i, j] = True
                        changed = True
    return c


@pytest.mark.parametrize("seed", range(5))
def test_closure_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n = 12
    # random DAG: edges only i<j
    adj = np.triu((rng.uniform(size=(n, n)) < 0.25).astype(np.uint8), k=1)
    closure = transitive_closure(adj)
    assert np.array_equal(closure, _brute_closure(adj))


@pytest.mark.parametrize("seed", range(5))
def test_reduction_closure_invariant(seed):
    """Reducing then re-closing a DAG recovers the closure exactly."""
    rng = np.random.default_rng(100 + seed)
    n = 10
    adj = np.triu((rng.uniform(size=(n, n)) < 0.3).astype(np.uint8), k=1)
    closure = transitive_closure(adj)
    reduced = minimal_graph(adj)
    assert np.array_equal(transitive_closure(reduced), closure)
    # reduction has no 2-hop shortcuts
    assert not np.any(reduced & (reduced @ reduced))


def test_current_and_transitive_split():
    cur, trans = get_current_and_transitive_triplets(GOLDEN_REDUCED)
    assert np.array_equal(cur, np.array(GOLDEN_REDUCED))
    # closure of the reduced graph minus itself = the 3 redundant edges
    assert len(trans) == 3
    joined = np.concatenate([cur, trans], axis=0)
    assert np.array_equal(
        triplets_to_adj_matrix(joined.tolist()),
        transitive_closure(triplets_to_adj_matrix(GOLDEN_TRIPLETS)).astype(np.uint8),
    )


def test_minimal_and_transitive_split():
    minimal, trans = get_minimal_and_transitive_triplets(GOLDEN_TRIPLETS)
    assert np.array_equal(minimal, np.array(GOLDEN_REDUCED))
    assert len(trans) == 3


def test_maximal_transitive():
    maximal = get_maximal_transitive_triplets(GOLDEN_REDUCED)
    assert len(maximal) == 6


def test_symmetric_triplets():
    sym = get_symmetric_triplets([[0, 5, 2], [1, 5, 3]])
    assert np.array_equal(sym, np.array([[2, 5, 0], [3, 5, 1]]))
