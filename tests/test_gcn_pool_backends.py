"""One-hot-matmul vs segment_sum pooling backends must agree exactly."""
import jax
import numpy as np

from canonicalsg2im_tpu.models.gcn import GraphTripleConv


def test_pool_backends_agree():
    rng = np.random.default_rng(0)
    B, O, T, D, P = 3, 7, 11, 12, 8
    obj_vecs = rng.normal(size=(B, O, D)).astype(np.float32)
    pred_vecs = rng.normal(size=(B, T, D)).astype(np.float32)
    edges = rng.integers(0, O, size=(B, T, 2)).astype(np.int32)
    pred_ids = rng.integers(0, P, size=(B, T)).astype(np.int32)
    pred_mask = rng.uniform(size=(B, T)) > 0.3
    ttype = rng.integers(0, 2, size=(B, T)).astype(np.int32)
    trans_w = rng.normal(size=(P,)).astype(np.float32)

    mm = GraphTripleConv(hidden_dim=8, object_output_dim=5,
                         predicate_output_dim=4,
                         matmul_pool_max_elems=1 << 30)
    ss = GraphTripleConv(hidden_dim=8, object_output_dim=5,
                         predicate_output_dim=4, matmul_pool_max_elems=0)
    variables = mm.init(jax.random.PRNGKey(0), obj_vecs, pred_vecs, edges,
                        pred_mask, ttype, pred_ids, trans_w)
    out_mm, p_mm = mm.apply(variables, obj_vecs, pred_vecs, edges, pred_mask,
                            ttype, pred_ids, trans_w)
    out_ss, p_ss = ss.apply(variables, obj_vecs, pred_vecs, edges, pred_mask,
                            ttype, pred_ids, trans_w)
    np.testing.assert_allclose(np.asarray(out_mm), np.asarray(out_ss),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_mm), np.asarray(p_ss), atol=1e-6)
