"""GraphTripleConv numerical parity against a literal torch port of the
reference layer (sg2im/graph.py:44-113) with identical weights."""
import jax
import numpy as np
import torch
import torch.nn as tnn

from canonicalsg2im_tpu.graphs import ORIGINAL_EDGE, TRANSITIVE_EDGE
from canonicalsg2im_tpu.models.gcn import GraphTripleConv


class TorchRefGconv(tnn.Module):
    """Per-sample-loop reference implementation."""

    def __init__(self, din, dpred, hidden, dout, dpout):
        super().__init__()
        self.hidden = hidden
        self.dpout = dpout
        self.net1 = tnn.Sequential(
            tnn.Linear(2 * din + dpred, hidden), tnn.ReLU(),
            tnn.Linear(hidden, 2 * hidden + dpout), tnn.ReLU())
        self.net2 = tnn.Sequential(
            tnn.Linear(hidden, hidden), tnn.ReLU(),
            tnn.Linear(hidden, dout), tnn.ReLU())

    def forward(self, obj_vecs, pred_vecs, edges, pred_ind, ttype, pids,
                trans_w):
        B, O, _ = obj_vecs.shape
        s_idx, o_idx = edges[..., 0], edges[..., 1]
        cur_s = torch.stack([obj_vecs[b, s_idx[b]] for b in range(B)])
        cur_o = torch.stack([obj_vecs[b, o_idx[b]] for b in range(B)])
        t_in = torch.cat([cur_s, pred_vecs, cur_o], dim=-1)
        new_t = self.net1(t_in)
        conf = ((ttype == ORIGINAL_EDGE).float()
                + (ttype == TRANSITIVE_EDGE).float()
                * torch.sigmoid(trans_w)[pids])
        new_t = new_t * conf.unsqueeze(-1)
        H, Dp = self.hidden, self.dpout
        new_s, new_p, new_o = new_t[..., :H], new_t[..., H:H + Dp], new_t[..., H + Dp:]

        pooled_all = []
        for b in range(B):
            ind = pred_ind[b]
            ss, oo = s_idx[b][ind], o_idx[b][ind]
            vs, vo = new_s[b][ind], new_o[b][ind]
            cc = conf[b][ind]
            pooled = torch.zeros(O, H)
            pooled = pooled.scatter_add(0, ss.view(-1, 1).expand_as(vs), vs)
            pooled = pooled.scatter_add(0, oo.view(-1, 1).expand_as(vo), vo)
            counts = torch.zeros(O)
            counts = counts.scatter_add(0, ss, cc)
            counts = counts.scatter_add(0, oo, cc)
            m = counts > 0
            pooled[m] = pooled[m] / counts[m].view(-1, 1)
            pooled_all.append(pooled)
        return self.net2(torch.stack(pooled_all)), new_p


def test_gcn_matches_torch_reference_with_shared_weights():
    rng = np.random.default_rng(0)
    B, O, T = 3, 6, 14
    din, dpred, hidden, dout, dpout, P = 10, 7, 12, 9, 8, 6
    obj_vecs = rng.normal(size=(B, O, din)).astype(np.float32)
    pred_vecs = rng.normal(size=(B, T, dpred)).astype(np.float32)
    edges = rng.integers(0, O, size=(B, T, 2)).astype(np.int32)
    pids = rng.integers(0, P, size=(B, T)).astype(np.int32)
    pred_ind = rng.uniform(size=(B, T)) > 0.25
    ttype = rng.integers(0, 2, size=(B, T)).astype(np.int32)
    trans_w = rng.normal(size=(P,)).astype(np.float32)

    jmodel = GraphTripleConv(hidden_dim=hidden, object_output_dim=dout,
                             predicate_output_dim=dpout)
    variables = jmodel.init(jax.random.PRNGKey(0), obj_vecs, pred_vecs, edges,
                            pred_ind, ttype, pids, trans_w)
    j_obj, j_pred = jmodel.apply(variables, obj_vecs, pred_vecs, edges,
                                 pred_ind, ttype, pids, trans_w)

    tmodel = TorchRefGconv(din, dpred, hidden, dout, dpout)
    p = variables["params"]
    with torch.no_grad():
        for tnet, jnet in (("net1", "net1"), ("net2", "net2")):
            seq = getattr(tmodel, tnet)
            seq[0].weight.copy_(torch.from_numpy(
                np.asarray(p[jnet]["Dense_0"]["kernel"]).T))
            seq[0].bias.copy_(torch.from_numpy(
                np.asarray(p[jnet]["Dense_0"]["bias"])))
            seq[2].weight.copy_(torch.from_numpy(
                np.asarray(p[jnet]["Dense_1"]["kernel"]).T))
            seq[2].bias.copy_(torch.from_numpy(
                np.asarray(p[jnet]["Dense_1"]["bias"])))
        t_obj, t_pred = tmodel(
            torch.from_numpy(obj_vecs), torch.from_numpy(pred_vecs),
            torch.from_numpy(edges).long(), torch.from_numpy(pred_ind),
            torch.from_numpy(ttype), torch.from_numpy(pids).long(),
            torch.from_numpy(trans_w))

    np.testing.assert_allclose(np.asarray(j_obj), t_obj.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_pred), t_pred.numpy(), atol=2e-5)
