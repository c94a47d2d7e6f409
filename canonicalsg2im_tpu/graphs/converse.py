"""Learned converse-relation probability model (WSGC's REINFORCE machinery).

Two halves, mirroring the reference split:

- Host half (NumPy): ``sample_converse_triplets`` draws converse edges for a
  relation's triplets from the softmax over the learned weight row plus a
  "no-edge" pseudo-option with logit 0, and tallies draws into the
  ``conv_counts`` matrix (reference `get_edge_converse_triplets`,
  scripts/graphs_utils.py:130-155). Runs inside the data pipeline.

- Device half (jnp): ``converse_log_prob`` / ``converse_log_likelihood`` are
  the differentiable log-probability of those draws, used as the REINFORCE
  surrogate loss (reference `calc_prob`/`calc_log_p`,
  scripts/graphs_utils.py:113-127). Written against the array namespace so
  they trace under jit and also run under NumPy on host.
"""
from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np


def _get_xp(arr):
    import jax.numpy as jnp

    return np if isinstance(arr, np.ndarray) else jnp


def converse_log_prob(converse_weights, rels: Iterable[int]):
    """Log-probability table over converse choices.

    Args:
      converse_weights: (P, P) symmetric learned weight matrix.
      rels: indices of the non-meta relations forming the sample space
        (together with the implicit no-edge option at column P, logit 0).

    Returns:
      (P, P+1) log-probabilities. Row i is normalized over
      {w[i, r] : r in rels, r != i} ∪ {0}; entries outside that support are
      *not* masked (the caller multiplies by observed counts, which are zero
      off-support), matching reference `calc_prob` semantics exactly.
    """
    xp = _get_xp(converse_weights)
    P = converse_weights.shape[0]
    padded = xp.concatenate(
        [converse_weights, xp.zeros((P, 1), dtype=converse_weights.dtype)], axis=-1
    )
    w = xp.exp(padded)
    cols = list(rels) + [P]
    w_sum = xp.sum(w[:, cols], axis=1)
    # remove each relation's self-converse option from its own normalizer
    w_sum = w_sum - xp.diagonal(w[:, :P])
    return padded - xp.log(w_sum)[:, None]


def converse_prob(converse_weights, rels: Iterable[int]):
    xp = _get_xp(converse_weights)
    return xp.exp(converse_log_prob(converse_weights, rels))


def converse_log_likelihood(converse_weights, rels: Sequence[int], conv_counts):
    """Per-sample log-likelihood of the sampled converse edges.

    conv_counts: (..., P, P+1) draw counts; returns (...,) summed log-prob.
    Reference `calc_log_p` (graphs_utils.py:125-127).
    """
    xp = _get_xp(converse_weights)
    log_prob = converse_log_prob(converse_weights, rels)
    return xp.sum(log_prob * conv_counts, axis=(-2, -1))


def sample_converse_triplets(
    triplets: np.ndarray,
    candidates: Sequence[int],
    converse_weights: np.ndarray,
    conv_counts: np.ndarray,
    rng: np.random.Generator | None = None,
    epsilon: float = 0.0,
):
    """Sample one converse edge (or no edge) for every triplet of one relation.

    Args:
      triplets: (T, 3) triplets, all sharing relation ``triplets[0, 1]``.
      candidates: candidate converse relation indices (non-meta, != rel).
      converse_weights: (P, P) learned weights (symmetrized, host copy).
      conv_counts: (P, P+1) tally matrix, mutated in place and returned.
      rng: NumPy generator.
      epsilon: BEYOND-REFERENCE intervention (off by default = reference
        semantics): with probability epsilon a draw comes from the uniform
        distribution over the options instead of the learned softmax —
        ε-exploration against REINFORCE basin lock-in (the r3b/r4 flagships
        and the reference's own torch implementation all hardened
        self-consistent wrong equilibria whose basins are selected by early
        sampling noise; see docs/RESULTS.md). The REINFORCE surrogate
        (``converse_log_likelihood``) is left as-is, making the update
        slightly off-policy — by design: exploration draws still produce
        gradient signal toward whatever the reward favors.

    Returns:
      (converse_triplets list, conv_counts). Each sampled converse edge is the
      reversed triplet [o, r, s] with the drawn relation r.
    """
    if rng is None:
        rng = np.random.default_rng()
    triplets = np.asarray(triplets, dtype=np.int64)
    rel = int(triplets[0, 1])
    no_edge = conv_counts.shape[1] - 1
    options = np.asarray(list(candidates) + [no_edge], dtype=np.int64)
    logits = np.concatenate(
        [np.asarray([converse_weights[rel, c] for c in candidates], dtype=np.float64),
         np.zeros(1)]
    )
    logits -= logits.max()
    probs = np.exp(logits)
    probs /= probs.sum()
    if epsilon > 0.0:
        probs = (1.0 - epsilon) * probs + epsilon / len(options)
        probs /= probs.sum()

    draws = rng.choice(options, size=len(triplets), p=probs)
    drawn, counts = np.unique(draws, return_counts=True)
    conv_counts[rel, drawn] += counts

    keep = draws != no_edge
    if not keep.any():
        return [], conv_counts
    src = triplets[keep]
    converse = np.stack([src[:, 2], draws[keep], src[:, 0]], axis=1)
    return list(converse), conv_counts


def converse_probability_table(converse_weights, vocab,
                               non_meta_rels: Sequence[int]):
    """Human-readable converse probability tables per relation.

    Mirrors the reference's checkpoint-time diagnostics
    (`compute_converse_edges`/`print_compute_converse_edges`,
    sg2im/data/utils.py:127-151): for every non-meta relation, the softmax
    probability of each candidate converse relation plus the "No Edge" option.

    Returns {relation_name: {candidate_name|'No Edge': prob}}.
    """
    names = vocab["pred_idx_to_name"]
    prob = np.asarray(converse_prob(np.asarray(converse_weights),
                                    non_meta_rels))
    P = len(names)
    entry = {}
    for i in range(P):
        if names[i] in ("__padding__", "__in_image__"):
            continue
        row = {}
        for j in range(P + 1):
            if j == P:
                row["No Edge"] = float(prob[i, j])
            elif names[j] in ("__padding__", "__in_image__") or i == j:
                continue
            else:
                row[names[j]] = float(prob[i, j])
        entry[names[i]] = row
    return entry


def transitive_probability_table(trans_weights, vocab):
    """{relation_name: sigmoid(trans_weight)} for non-meta relations
    (reference `compute_transitive_edges`, sg2im/data/utils.py:117-124;
    the GCN applies sigmoid(w) as the transitive-edge confidence)."""
    names = vocab["pred_idx_to_name"]
    w = np.asarray(trans_weights, np.float64)
    sig = 1.0 / (1.0 + np.exp(-w))
    return {names[i]: float(sig[i]) for i in range(len(names))
            if names[i] not in ("__padding__", "__in_image__")}


def format_probability_tables(converse_weights, trans_weights, vocab,
                              non_meta_rels: Sequence[int]) -> str:
    """One printable block of both tables (checkpoint-time diagnostic)."""
    lines = []
    if converse_weights is not None:
        lines.append("learned converse probabilities:")
        table = converse_probability_table(converse_weights, vocab,
                                           non_meta_rels)
        for rel, row in table.items():
            pretty = ", ".join(f"{k}: {v:.3f}" for k, v in sorted(
                row.items(), key=lambda kv: -kv[1]))
            lines.append(f"  {rel}: {pretty}")
    if trans_weights is not None:
        lines.append("learned transitivity sigmoid(w):")
        for rel, v in transitive_probability_table(trans_weights,
                                                   vocab).items():
            lines.append(f"  {rel}: {v:.3f}")
    return "\n".join(lines)
