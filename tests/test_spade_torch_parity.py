"""SPADE conditional-norm parity against a literal torch port
(spade/models/networks/normalization.py:66-110) with shared weights."""
import jax
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from canonicalsg2im_tpu.models.spade import SPADE


class TorchSPADE(tnn.Module):
    def __init__(self, norm_nc, label_nc, ks=3):
        super().__init__()
        self.param_free_norm = tnn.BatchNorm2d(norm_nc, affine=False)
        pw = ks // 2
        self.mlp_shared = tnn.Sequential(
            tnn.Conv2d(label_nc, 128, kernel_size=ks, padding=pw), tnn.ReLU())
        self.mlp_gamma = tnn.Conv2d(128, norm_nc, kernel_size=ks, padding=pw)
        self.mlp_beta = tnn.Conv2d(128, norm_nc, kernel_size=ks, padding=pw)

    def forward(self, x, segmap):
        normalized = self.param_free_norm(x)
        segmap = F.interpolate(segmap, size=x.size()[2:], mode="nearest")
        actv = self.mlp_shared(segmap)
        gamma = self.mlp_gamma(actv)
        beta = self.mlp_beta(actv)
        return normalized * (1 + gamma) + beta


def _copy_conv(tconv, jparams):
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(
            np.asarray(jparams["kernel"]).transpose(3, 2, 0, 1)))
        tconv.bias.copy_(torch.from_numpy(np.asarray(jparams["bias"])))


def test_spade_matches_torch_with_shared_weights():
    rng = np.random.default_rng(0)
    B, H, W, C, S = 2, 8, 8, 5, 6
    x = rng.normal(1.0, 2.0, size=(B, H, W, C)).astype(np.float32)
    # seg at 2x resolution: exercises the nearest-downsample path
    seg = rng.normal(size=(B, 2 * H, 2 * W, S)).astype(np.float32)

    jm = SPADE("spadesyncbatch3x3", C)
    variables = jm.init(jax.random.PRNGKey(0), x, seg, train=True)
    j_out, _ = jm.apply(variables, x, seg, train=True,
                        mutable=["batch_stats"])

    tm = TorchSPADE(C, S)
    tm.train()
    p = variables["params"]
    _copy_conv(tm.mlp_shared[0], p["mlp_shared"])
    _copy_conv(tm.mlp_gamma, p["mlp_gamma"])
    _copy_conv(tm.mlp_beta, p["mlp_beta"])
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(seg.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(j_out).transpose(0, 3, 1, 2),
                               t_out.numpy(), atol=5e-4)
