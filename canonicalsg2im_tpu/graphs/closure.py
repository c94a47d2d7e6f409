"""Scene-graph closure / canonicalization algorithms (host-side, pure NumPy).

These are the WSGC graph algorithms from the reference
(`/root/reference/scripts/graphs_utils.py:15-110`), re-expressed with
vectorized boolean matrix algebra instead of the reference's O(n^3) Python
triple loops:

- transitive closure is an iterated-squaring boolean-matmul fixpoint rather
  than the reference's single-pass row-propagation loop (`path`,
  graphs_utils.py:15); on DAGs (which is what every per-relation subgraph is —
  spatial relations are strict orders) the two agree, and on general graphs
  this version computes true reachability.
- minimal-equivalent-graph reduction (`hsu`, graphs_utils.py:30) becomes
  ``closure & ~(closure @ closure)``: an edge of the closure is redundant iff
  a 2-hop path exists within the closure.

Everything here runs in the input pipeline on the host; none of it is traced
by JAX. Edge-type tags match the reference
(`sg2im/data/base_dataset.py:7-10`).
"""
from __future__ import annotations

import numpy as np

ORIGINAL_EDGE = 0
TRANSITIVE_EDGE = 1
SYMMETRIC_EDGE = 2
ANTI_SYMMETRIC_EDGE = 3


def transitive_closure(adj: np.ndarray) -> np.ndarray:
    """Boolean transitive closure (reachability by paths of length >= 1).

    Iterated squaring: O(log n) boolean matmuls, each of which XLA/NumPy
    executes as a dense matmul — far friendlier than a Python triple loop.
    """
    closure = adj.astype(bool)
    n = closure.shape[0]
    if n == 0:
        return closure
    while True:
        nxt = closure | (closure @ closure)
        if np.array_equal(nxt, closure):
            return nxt
        closure = nxt


def transitive_reduction(closure: np.ndarray) -> np.ndarray:
    """Minimal equivalent graph of a transitively closed DAG.

    For a closed DAG the reduction is unique: drop edge (i, k) iff some
    intermediate j gives i -> j -> k inside the closure. Mirrors the in-place
    `hsu` pass of the reference (graphs_utils.py:30-38) in one matmul.
    """
    closure = closure.astype(bool)
    two_hop = closure @ closure
    return closure & ~two_hop


def minimal_graph(adj: np.ndarray) -> np.ndarray:
    """closure -> reduction, the reference's `get_minimal_graph` (graphs_utils.py:41)."""
    return transitive_reduction(transitive_closure(adj))


def triplets_to_adj_matrix(triplets) -> np.ndarray:
    """(T, 3) [s, p, o] triplets (single relation) -> dense (N, N) uint8 adjacency.

    N = max node index referenced + 1, matching graphs_utils.py:47-55.
    """
    triplets = np.asarray(triplets, dtype=np.int64)
    src, dst = triplets[:, 0], triplets[:, 2]
    n = int(max(src.max(), dst.max())) + 1
    adj = np.zeros((n, n), dtype=np.uint8)
    adj[src, dst] = 1
    return adj


def matrix_to_triplets(adj: np.ndarray, rel_idx: int) -> np.ndarray:
    """Dense adjacency -> (T, 3) triplets with relation `rel_idx` (graphs_utils.py:58)."""
    rows, cols = np.nonzero(np.asarray(adj, dtype=np.uint8))
    rels = np.full(len(rows), rel_idx, dtype=np.int64)
    return np.stack([rows, rels, cols], axis=1)


def triplets_to_minimal(triplets) -> np.ndarray:
    """Reduce a single-relation triplet list to its minimal equivalent DAG.

    Triplet lists with < 3 edges are returned unchanged (graphs_utils.py:64-71).
    """
    triplets = np.asarray(triplets)
    if len(triplets) < 3:
        return triplets
    adj = triplets_to_adj_matrix(triplets)
    return matrix_to_triplets(minimal_graph(adj), int(triplets[0][1]))


def reduce_transitive_edges(triplets, p_keep: float = 0.5,
                            rng: np.random.Generator | None = None) -> np.ndarray:
    """Keep the minimal graph plus a Bernoulli(p_keep) sample of the redundant
    (transitive) edges — graphs_utils.py:74-82."""
    triplets = np.asarray(triplets)
    if len(triplets) < 3:
        return triplets
    if rng is None:
        rng = np.random.default_rng()
    adj = triplets_to_adj_matrix(triplets)
    minimal = minimal_graph(adj).astype(np.uint8)
    redundant = adj.astype(np.uint8) - minimal
    prob = rng.uniform(0.0, 1.0, adj.shape)
    kept = ((prob * redundant) > (1.0 - p_keep)).astype(np.uint8) + minimal
    return matrix_to_triplets(kept, int(triplets[0][1]))


def get_maximal_transitive_triplets(triplets) -> np.ndarray:
    """All edges of the transitive closure (graphs_utils.py:85-90)."""
    triplets = np.asarray(triplets)
    if len(triplets) < 2:
        return triplets
    adj = triplets_to_adj_matrix(triplets)
    return matrix_to_triplets(transitive_closure(adj), int(triplets[0][1]))


def get_minimal_and_transitive_triplets(triplets):
    """-> (minimal-graph triplets, closure - minimal triplets); graphs_utils.py:93-98."""
    adj = triplets_to_adj_matrix(triplets)
    closure = transitive_closure(adj).astype(np.int64)
    minimal = transitive_reduction(closure).astype(np.int64)
    rel = int(np.asarray(triplets)[0][1])
    return matrix_to_triplets(minimal, rel), matrix_to_triplets(closure - minimal, rel)


def get_current_and_transitive_triplets(triplets):
    """-> (input triplets as-is, closure - input); graphs_utils.py:101-105."""
    adj = triplets_to_adj_matrix(triplets).astype(np.int64)
    closure = transitive_closure(adj).astype(np.int64)
    rel = int(np.asarray(triplets)[0][1])
    return matrix_to_triplets(adj, rel), matrix_to_triplets(closure - adj, rel)


def get_symmetric_triplets(triplets) -> np.ndarray:
    """Reverse each [s, p, o] to [o, p, s] (graphs_utils.py:108-110)."""
    return np.asarray(triplets)[:, ::-1]
