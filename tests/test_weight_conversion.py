"""Golden-activation tests for the pretrained-weight converters.

No pretrained .pth files exist in this image (no network), so these tests
prove the *conversion path* is numerically exact with random-but-shared
weights: a torch oracle (layer layout and state-dict names identical to
torchvision's vgg19 / inception_v3, used strictly as a labeled test oracle —
reference tap indices: spade/models/networks/architecture.py:98-117;
reference FID blocks: evaluation/fid/inception.py:168-310) is randomly
initialized, its state_dict is run through scripts/convert_weights.py, loaded
by the framework's own loaders, and the flax graphs are asserted numerically
identical to torch's, layer by layer. The moment real weights appear, the
same code path is already proven correct.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-12)


# ------------------------------------------------------------------- VGG19

VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
VGG_TAP_INDICES = (1, 6, 11, 20, 29)  # relu1_1 ... relu5_1


class TorchVGG19(nn.Module):
    """torchvision.models.vgg19().features layout (oracle)."""

    def __init__(self):
        super().__init__()
        layers, in_c = [], 3
        for v in VGG19_CFG:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(in_c, v, 3, padding=1))
                layers.append(nn.ReLU())
                in_c = v
        self.features = nn.Sequential(*layers)

    def taps(self, x):
        out = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in VGG_TAP_INDICES:
                out.append(x)
            if i == VGG_TAP_INDICES[-1]:
                break
        return out


def test_vgg19_conversion_golden_activations(tmp_path):
    from canonicalsg2im_tpu.models.vgg import VGG19Features, load_vgg_params
    from scripts.convert_weights import convert_vgg19

    torch.manual_seed(0)
    oracle = TorchVGG19().eval()
    pth = tmp_path / "vgg19-random.pth"
    torch.save(oracle.state_dict(), pth)
    convert_vgg19(str(pth), str(tmp_path))

    params, pretrained = load_vgg_params(str(tmp_path))
    assert pretrained

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        torch_taps = [t.numpy().transpose(0, 2, 3, 1)
                      for t in oracle.taps(torch.from_numpy(x))]
    flax_taps = VGG19Features().apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(flax_taps) == len(torch_taps) == 5
    for i, (ours, ref) in enumerate(zip(flax_taps, torch_taps)):
        assert ours.shape == ref.shape
        assert _rel_err(ours, ref) < 1e-5, f"tap {i} diverges"


# --------------------------------------------------------------- InceptionV3

class TBasicConv2d(nn.Module):
    def __init__(self, in_c, out_c, **kw):
        super().__init__()
        self.conv = nn.Conv2d(in_c, out_c, bias=False, **kw)
        self.bn = nn.BatchNorm2d(out_c, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _branch_pool_3x3(x, mode):
    if mode == "max":
        return F.max_pool2d(x, 3, stride=1, padding=1)
    return F.avg_pool2d(x, 3, stride=1, padding=1,
                        count_include_pad=(mode == "avg"))


class TInceptionA(nn.Module):
    def __init__(self, in_c, pool_features, pool_mode="avg"):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = TBasicConv2d(in_c, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(in_c, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_c, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(in_c, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_branch_pool_3x3(x, self.pool_mode))
        return torch.cat([b1, b5, b3, bp], 1)


class TInceptionB(nn.Module):
    def __init__(self, in_c):
        super().__init__()
        self.branch3x3 = TBasicConv2d(in_c, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_c, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class TInceptionC(nn.Module):
    def __init__(self, in_c, c7, pool_mode="avg"):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = TBasicConv2d(in_c, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(in_c, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(in_c, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch_pool = TBasicConv2d(in_c, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(_branch_pool_3x3(x, self.pool_mode))
        return torch.cat([b1, b7, bd, bp], 1)


class TInceptionD(nn.Module):
    def __init__(self, in_c):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(in_c, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(in_c, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class TInceptionE(nn.Module):
    def __init__(self, in_c, pool_mode="avg"):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = TBasicConv2d(in_c, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(in_c, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                         padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                         padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(in_c, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
        self.branch_pool = TBasicConv2d(in_c, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(_branch_pool_3x3(x, self.pool_mode))
        return torch.cat([b1, b3, bd, bp], 1)


class TorchInceptionV3(nn.Module):
    """torchvision inception_v3(aux_logits=False) layout; variant='fid'
    applies the reference's FID patches (evaluation/fid/inception.py:222-310):
    count_include_pad=False avg-pools in A/C/7b, max-pool branch in 7c,
    1008-way fc."""

    def __init__(self, variant="torchvision"):
        super().__init__()
        fid = variant == "fid"
        ac = "avg_excl" if fid else "avg"
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32, ac)
        self.Mixed_5c = TInceptionA(256, 64, ac)
        self.Mixed_5d = TInceptionA(288, 64, ac)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128, ac)
        self.Mixed_6c = TInceptionC(768, 160, ac)
        self.Mixed_6d = TInceptionC(768, 160, ac)
        self.Mixed_6e = TInceptionC(768, 192, ac)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, ac)
        self.Mixed_7c = TInceptionE(2048, "max" if fid else "avg")
        self.fc = nn.Linear(2048, 1008 if fid else 1000)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        pool = F.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.fc(pool), pool


def _randomize_bn_stats(model, seed):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.5)


@pytest.mark.parametrize("variant,npz_name", [
    ("torchvision", "inception_v3.npz"),
    ("fid", "fid_inception.npz"),
])
def test_inception_conversion_golden_activations(tmp_path, variant, npz_name):
    from canonicalsg2im_tpu.evaluation.inception import (
        InceptionV3, load_inception_variables)
    from scripts.convert_weights import convert_inception

    torch.manual_seed(42)
    oracle = TorchInceptionV3(variant)
    with torch.no_grad():
        _randomize_bn_stats(oracle, 7)
    oracle.eval()
    pth = tmp_path / "inception-random.pth"
    torch.save(oracle.state_dict(), pth)
    convert_inception(str(pth), str(tmp_path), name=npz_name)

    variables, pretrained = load_inception_variables(
        str(tmp_path), name=npz_name, variant=variant)
    assert pretrained

    rng = np.random.default_rng(3)
    # fully convolutional until the adaptive pool: 128^2 exercises every
    # stride/pad decision while keeping the CPU forward cheap
    x = rng.uniform(-1, 1, size=(2, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        t_logits, t_pool = oracle(torch.from_numpy(x))
    logits, pool = InceptionV3(variant=variant).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert pool.shape == (2, 2048)
    assert logits.shape == (2, 1008 if variant == "fid" else 1000)
    assert _rel_err(pool, t_pool.numpy()) < 1e-4
    assert _rel_err(logits, t_logits.numpy()) < 1e-4


def test_fid_variant_differs_from_torchvision(tmp_path):
    """The FID patches must actually change the pool activations (guards
    against the variant flag silently not being wired through)."""
    from canonicalsg2im_tpu.evaluation.inception import InceptionV3

    import jax

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-1, 1, size=(1, 96, 96, 3)), jnp.float32)
    tv = InceptionV3(variant="torchvision")
    fid = InceptionV3(variant="fid")
    v_tv = tv.init(jax.random.PRNGKey(0), x)
    _, pool_tv = tv.apply(v_tv, x)
    # the FID graph has the same param structure except the fc head
    v_fid = fid.init(jax.random.PRNGKey(0), x)
    v_fid["params"]["fc"] = v_fid["params"]["fc"]  # keep own 1008 head
    for k in v_tv["params"]:
        if k != "fc":
            v_fid["params"][k] = v_tv["params"][k]
    v_fid["batch_stats"] = v_tv["batch_stats"]
    _, pool_fid = fid.apply(v_fid, x)
    assert float(jnp.max(jnp.abs(pool_fid - pool_tv))) > 1e-6
