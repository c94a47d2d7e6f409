"""Converse probability model vs. an independent reference implementation of
the reference's `calc_prob`/`calc_log_p`/`get_edge_converse_triplets`
(scripts/graphs_utils.py:113-155)."""
import numpy as np
import pytest

from canonicalsg2im_tpu.graphs import (
    converse_log_likelihood,
    converse_log_prob,
    converse_prob,
    sample_converse_triplets,
)


def _ref_calc_prob(cw, rels, log=False):
    """Literal port of the torch reference to numpy for cross-checking."""
    P = cw.shape[0]
    padded = np.concatenate([cw, np.zeros((P, 1))], axis=-1)
    w = np.exp(padded)
    cols = list(rels) + [P]
    w_sum = w[:, cols].sum(axis=1)
    w_sum = w_sum - np.diagonal(w[:, :P])
    log_prob = padded - np.log(w_sum)[:, None]
    return log_prob if log else np.exp(log_prob)


@pytest.mark.parametrize("seed", range(3))
def test_converse_prob_matches_reference(seed):
    rng = np.random.default_rng(seed)
    P = 8
    cw = rng.normal(size=(P, P))
    cw = np.triu(cw) + np.triu(cw).T
    rels = [2, 3, 4, 5, 6, 7]
    got = converse_log_prob(cw, rels)
    want = _ref_calc_prob(cw, rels, log=True)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    np.testing.assert_allclose(converse_prob(cw, rels), np.exp(want), rtol=1e-12)


def test_converse_prob_rows_normalize():
    rng = np.random.default_rng(1)
    P = 8
    cw = rng.normal(size=(P, P))
    cw = np.triu(cw) + np.triu(cw).T
    rels = [2, 3, 4, 5, 6, 7]
    prob = converse_prob(cw, rels)
    for r in rels:
        support = [c for c in rels if c != r] + [P]
        assert abs(prob[r, support].sum() - 1.0) < 1e-10


def test_log_likelihood_shapes():
    rng = np.random.default_rng(2)
    P = 6
    cw = rng.normal(size=(P, P))
    counts = rng.integers(0, 4, size=(5, P, P + 1)).astype(np.float64)
    rels = [2, 3, 4, 5]
    ll = converse_log_likelihood(cw, rels, counts)
    assert ll.shape == (5,)
    # manual check for one sample
    lp = converse_log_prob(cw, rels)
    np.testing.assert_allclose(ll[0], (lp * counts[0]).sum(), rtol=1e-12)


def test_log_likelihood_jax_gradient():
    import jax
    import jax.numpy as jnp

    P = 6
    rels = [2, 3, 4, 5]
    counts = jnp.zeros((P, P + 1)).at[2, 3].set(4.0).at[3, P].set(2.0)

    def loss(w):
        sym = jnp.triu(w) + jnp.triu(w).T
        return -converse_log_likelihood(sym, rels, counts)

    w = jnp.zeros((P, P))
    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
    # increasing w[2,3] should increase likelihood of the observed 2->3 draws
    assert g[2, 3] < 0


def test_sampling_counts_and_reversal():
    rng = np.random.default_rng(3)
    P = 8
    cw = np.zeros((P, P))
    cw[2, 5] = 10.0  # make converse 5 nearly certain for relation 2
    cw[5, 2] = 10.0
    triplets = np.array([[0, 2, 1], [1, 2, 3], [4, 2, 0]])
    counts = np.zeros((P, P + 1))
    converse, counts = sample_converse_triplets(
        triplets, [3, 4, 5, 6, 7], cw, counts, rng=rng)
    assert counts.sum() == 3
    assert counts[2].sum() == 3
    assert counts[2, 5] == 3  # overwhelming logit
    conv = np.array(converse)
    # reversed subject/object with sampled relation
    assert np.array_equal(conv[:, [2, 0]], triplets[:, [0, 2]])
    assert (conv[:, 1] == 5).all()


def test_sampling_no_edge_option():
    rng = np.random.default_rng(4)
    P = 4
    cw = np.full((P, P), -20.0)  # all candidates much worse than no-edge (0)
    triplets = np.array([[0, 2, 1]])
    counts = np.zeros((P, P + 1))
    converse, counts = sample_converse_triplets(triplets, [3], cw, counts, rng=rng)
    assert converse == []
    assert counts[2, P] == 1


def test_epsilon_exploration_breaks_saturation():
    """The ε-exploration intervention must keep non-argmax options sampled
    even when the learned softmax has saturated (the basin-lock-in failure
    mode), and ε=0 must reproduce the reference sampler exactly."""
    P = 8
    cw = np.zeros((P, P))
    cw[2, 5] = 50.0  # saturated: softmax puts ~everything on candidate 5
    cw[5, 2] = 50.0
    T = 4000
    triplets = np.stack([np.arange(T) % 7, np.full(T, 2),
                         (np.arange(T) + 1) % 7], axis=1)

    counts0 = np.zeros((P, P + 1))
    _, counts0 = sample_converse_triplets(
        triplets, [3, 4, 5, 6, 7], cw, counts0,
        rng=np.random.default_rng(0), epsilon=0.0)
    assert counts0[2, 5] == T  # reference behavior: argmax-only forever

    # ε=0 must match the default-path draws bit-for-bit at the same seed
    counts_ref = np.zeros((P, P + 1))
    _, counts_ref = sample_converse_triplets(
        triplets, [3, 4, 5, 6, 7], cw, counts_ref,
        rng=np.random.default_rng(0))
    np.testing.assert_array_equal(counts0, counts_ref)

    counts_eps = np.zeros((P, P + 1))
    _, counts_eps = sample_converse_triplets(
        triplets, [3, 4, 5, 6, 7], cw, counts_eps,
        rng=np.random.default_rng(0), epsilon=0.3)
    assert counts_eps.sum() == T
    # 0.3 * 5/6 of the mass goes to the five non-argmax options uniformly
    off_argmax = counts_eps[2].sum() - counts_eps[2, 5]
    assert abs(off_argmax / T - 0.25) < 0.03, counts_eps[2]
