"""Golden tests for the reference-checkpoint importer
(scripts/convert_reference_checkpoint.py).

No reference .pt files exist in this image, so each test constructs a torch
oracle whose module tree and state-dict names replicate the reference's
exactly (naming sources: sg2im/model.py:18-79, sg2im/attribute_embed.py:18-29,
sg2im/graph.py:17-43, spade/models/networks/generator.py:13-63,
architecture.py:21-47, normalization.py:66-110, discriminator.py:66-261,
sg2im/layers.py:6-112), randomly initializes it (including running stats),
exports its ``state_dict``, converts, and asserts the flax model produces the
same outputs. The moment a real reference checkpoint appears, the import path
is already proven numerically exact.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from canonicalsg2im_tpu.data.vocab import build_clevr_vocab

from scripts.convert_reference_checkpoint import (
    SubDict,
    convert_ac_crop_discriminator,
    convert_generator,
    convert_multiscale_discriminator,
    convert_sg2layout,
    convert_spade_resblock,
    infer_config_overrides,
    overlay_strict,
)

from test_gcn_torch_parity import TorchRefGconv
from test_spade_torch_parity import TorchSPADE


def _state(sd, prefix=""):
    flat = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    if prefix:
        flat = {prefix + k: v for k, v in flat.items()}
    return flat


def _converge_sn(module, iters=200):
    """Run torch's spectral-norm power iteration to convergence on every
    wrapped layer. Real reference checkpoints carry converged u/v (they are
    updated every training forward); flax's SpectralNorm re-runs one power
    iteration from the imported u at apply time, which is a no-op once u/v
    are converged — so this mirrors exactly the state a trained reference
    checkpoint is in."""
    with torch.no_grad():
        for m in module.modules():
            if hasattr(m, "weight_orig"):
                w = m.weight_orig.detach()
                w_mat = w.reshape(w.shape[0], -1)
                u, v = m.weight_u, m.weight_v
                for _ in range(iters):
                    v.copy_(F.normalize(w_mat.t() @ u, dim=0, eps=1e-12))
                    u.copy_(F.normalize(w_mat @ v, dim=0, eps=1e-12))


def _randomize_bn_stats(module, gen):
    """Give every BatchNorm non-trivial running stats so the conversion of
    the stats (not just the weights) is exercised."""
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.normal_(0.0, 0.5, generator=gen)
                m.running_var.uniform_(0.5, 2.0, generator=gen)


def _allclose(j, t_nchw, atol):
    np.testing.assert_allclose(
        np.asarray(j).transpose(0, 3, 1, 2), t_nchw.detach().numpy(),
        atol=atol)


# ----------------------------------------------------------- torch oracles


def t_build_mlp(dims, final_relu):
    """build_mlp, mlp_normalization='none' (sg2im/layers.py:6-25)."""
    layers = []
    for i in range(len(dims) - 1):
        layers.append(tnn.Linear(dims[i], dims[i + 1]))
        if i < len(dims) - 2:
            layers.append(tnn.ReLU())
    if final_relu:
        layers.append(tnn.ReLU())
    return tnn.Sequential(*layers)


class TorchAttributeEmbeddings(tnn.Module):
    """attribute_embed.py:18-48 naming: att_emb_k + attribute_fc_gen."""

    def __init__(self, attributes, embedding_dim, use_attr_fc_gen=False):
        super().__init__()
        names = list(attributes)
        if len(names) > 1 or use_attr_fc_gen:
            self.attribute_fc_gen = tnn.Linear(
                len(names) * embedding_dim, len(names) * embedding_dim)
        for k, name in enumerate(names):
            self.add_module(
                f"att_emb_{k}",
                tnn.Embedding(max(attributes[name].values()) + 1,
                              embedding_dim))

    def forward(self, x):
        vecs = [getattr(self, f"att_emb_{k}")(x[..., k])
                for k in range(x.shape[-1])]
        out = torch.cat(vecs, dim=-1)
        if hasattr(self, "attribute_fc_gen"):
            out = self.attribute_fc_gen(out)
        return out


class TorchSg2Layout(tnn.Module):
    """sg2im/model.py:18-124 naming."""

    def __init__(self, vocab, embedding_dim, gconv_dim, hidden, num_layers):
        super().__init__()
        self.vocab = vocab
        A = len(vocab["attributes"])
        P = len(vocab["pred_idx_to_name"])
        self.attribute_embedding = TorchAttributeEmbeddings(
            vocab["attributes"], embedding_dim)
        self.pred_embeddings = tnn.Embedding(P, embedding_dim)
        self.trans_candidates_weights = tnn.Parameter(torch.randn(P))
        self.converse_candidates_weights = tnn.Parameter(torch.randn(P, P))
        self.gconvs = tnn.ModuleList()
        obj_in = A * embedding_dim
        pred_in = embedding_dim
        for _ in range(num_layers):
            self.gconvs.append(
                TorchRefGconv(obj_in, pred_in, hidden, gconv_dim, gconv_dim))
            obj_in = pred_in = gconv_dim
        self.box_net = t_build_mlp([gconv_dim, hidden, 4], final_relu=False)

    def forward(self, objs, triplets, ttype):
        pad = self.vocab["pred_name_to_idx"]["__padding__"]
        s, p, o = triplets[..., 0], triplets[..., 1], triplets[..., 2]
        edges = torch.stack([s, o], dim=-1)
        pred_ind = p != pad
        obj_vecs = self.attribute_embedding(objs)
        pred_vecs = self.pred_embeddings(p)
        for g in self.gconvs:
            obj_vecs, pred_vecs = g(obj_vecs, pred_vecs, edges, pred_ind,
                                    ttype, p, self.trans_candidates_weights)
        return obj_vecs, self.box_net(obj_vecs)


def sn(m):
    return torch.nn.utils.spectral_norm(m)


class TorchSPADEResnetBlock(tnn.Module):
    """architecture.py:21-68 naming (spectral norm on)."""

    def __init__(self, fin, fout, label_nc):
        super().__init__()
        self.learned_shortcut = fin != fout
        fmiddle = min(fin, fout)
        self.conv_0 = sn(tnn.Conv2d(fin, fmiddle, 3, padding=1))
        self.conv_1 = sn(tnn.Conv2d(fmiddle, fout, 3, padding=1))
        if self.learned_shortcut:
            self.conv_s = sn(tnn.Conv2d(fin, fout, 1, bias=False))
            self.norm_s = TorchSPADE(fin, label_nc)
        self.norm_0 = TorchSPADE(fin, label_nc)
        self.norm_1 = TorchSPADE(fmiddle, label_nc)

    def forward(self, x, seg):
        x_s = (self.conv_s(self.norm_s(x, seg)) if self.learned_shortcut
               else x)
        dx = self.conv_0(F.leaky_relu(self.norm_0(x, seg), 0.2))
        dx = self.conv_1(F.leaky_relu(self.norm_1(dx, seg), 0.2))
        return x_s + dx


class TorchSPADEGenerator(tnn.Module):
    """generator.py:13-127 naming; forward takes the prebuilt seg (the seg
    splat itself is oracle-tested in test_layout_ops.py)."""

    def __init__(self, attributes, embedding_dim, ngf, label_nc, sw):
        super().__init__()
        nf = ngf
        self.sw = sw
        self.attribute_embedding = TorchAttributeEmbeddings(
            attributes, embedding_dim)
        self.fc = tnn.Conv2d(label_nc, 16 * nf, 3, padding=1)
        self.head_0 = TorchSPADEResnetBlock(16 * nf, 16 * nf, label_nc)
        self.G_middle_0 = TorchSPADEResnetBlock(16 * nf, 16 * nf, label_nc)
        self.G_middle_1 = TorchSPADEResnetBlock(16 * nf, 16 * nf, label_nc)
        self.up_0 = TorchSPADEResnetBlock(16 * nf, 8 * nf, label_nc)
        self.up_1 = TorchSPADEResnetBlock(8 * nf, 4 * nf, label_nc)
        self.up_2 = TorchSPADEResnetBlock(4 * nf, 2 * nf, label_nc)
        self.up_3 = TorchSPADEResnetBlock(2 * nf, 1 * nf, label_nc)
        self.conv_img = tnn.Conv2d(nf, 3, 3, padding=1)

    def forward(self, seg):
        up = lambda x: F.interpolate(x, scale_factor=2)
        x = F.interpolate(seg, size=(self.sw, self.sw))
        x = self.fc(x)
        x = self.head_0(x, seg)
        x = up(x)
        x = self.G_middle_0(x, seg)
        x = self.G_middle_1(x, seg)
        x = up(x)
        x = self.up_0(x, seg)
        x = up(x)
        x = self.up_1(x, seg)
        x = up(x)
        x = self.up_2(x, seg)
        x = up(x)
        x = self.up_3(x, seg)
        return torch.tanh(self.conv_img(F.leaky_relu(x, 0.2)))


class TorchNLayerDiscriminator(tnn.Module):
    """discriminator.py:164-206 naming: model0 bare, middles spectral-normed
    + InstanceNorm (bias dropped), final head bare."""

    def __init__(self, input_nc, ndf, n_layers):
        super().__init__()
        self.n = n_layers
        nf = ndf
        self.add_module("model0", tnn.Sequential(
            tnn.Conv2d(input_nc, nf, 4, stride=2, padding=2),
            tnn.LeakyReLU(0.2)))
        for i in range(1, n_layers):
            nf_prev, nf = nf, min(nf * 2, 512)
            stride = 1 if i == n_layers - 1 else 2
            self.add_module(f"model{i}", tnn.Sequential(
                sn(tnn.Conv2d(nf_prev, nf, 4, stride=stride, padding=2,
                              bias=False)),
                tnn.InstanceNorm2d(nf, affine=False),
                tnn.LeakyReLU(0.2)))
        self.add_module(f"model{n_layers}", tnn.Sequential(
            tnn.Conv2d(nf, 1, 4, stride=1, padding=2)))

    def forward(self, x):
        outs = []
        for i in range(self.n + 1):
            x = getattr(self, f"model{i}")(x)
            outs.append(x)
        return outs


class TorchMultiscaleDiscriminator(tnn.Module):
    """discriminator.py:66-131 naming; forward takes [img, seg] prebuilt."""

    def __init__(self, attributes, embedding_dim, input_nc, ndf, num_D,
                 n_layers):
        super().__init__()
        self.num_D = num_D
        self.attribute_embedding = TorchAttributeEmbeddings(
            attributes, embedding_dim, use_attr_fc_gen=True)
        for i in range(num_D):
            self.add_module(f"discriminator_{i}",
                            TorchNLayerDiscriminator(input_nc, ndf, n_layers))

    def forward(self, x):
        result = []
        for i in range(self.num_D):
            result.append(getattr(self, f"discriminator_{i}")(x))
            x = F.avg_pool2d(x, 3, stride=2, padding=1,
                             count_include_pad=False)
        return result


class TorchGlobalAvgPool(tnn.Module):
    def forward(self, x):
        return x.mean(dim=(2, 3))


class TorchAcCropDiscriminator(tnn.Module):
    """discriminator.py:209-261 naming: nested 'discriminator' with
    cnn = Sequential(build_cnn, GlobalAvgPool, Linear) + two heads.
    arch C4-64-2,C4-128-2,C4-256-2, batch norm, leakyrelu-0.2, valid pad."""

    class Inner(tnn.Module):
        def __init__(self, num_objects):
            super().__init__()
            self.cnn = tnn.Sequential(
                tnn.Sequential(
                    tnn.Conv2d(3, 64, 4, stride=2, padding=0),
                    tnn.BatchNorm2d(64), tnn.LeakyReLU(0.2),
                    tnn.Conv2d(64, 128, 4, stride=2, padding=0),
                    tnn.BatchNorm2d(128), tnn.LeakyReLU(0.2),
                    tnn.Conv2d(128, 256, 4, stride=2, padding=0)),
                TorchGlobalAvgPool(),
                tnn.Linear(256, 1024))
            self.real_classifier = tnn.Linear(1024, 1)
            self.obj_classifier = tnn.Linear(1024, num_objects)

        def forward(self, x, y):
            vecs = self.cnn(x)
            return (self.real_classifier(vecs),
                    F.cross_entropy(self.obj_classifier(vecs), y))

    def __init__(self, num_objects):
        super().__init__()
        self.discriminator = self.Inner(num_objects)


# ------------------------------------------------------------------- tests

VOCAB = build_clevr_vocab()
A = len(VOCAB["attributes"])
P = len(VOCAB["pred_idx_to_name"])


def _rand_graph(rng, B, O, T):
    objs = rng.integers(1, 3, size=(B, O, A)).astype(np.int32)
    triplets = np.stack([rng.integers(0, O, size=(B, T)),
                         rng.integers(0, P, size=(B, T)),
                         rng.integers(0, O, size=(B, T))], axis=-1
                        ).astype(np.int32)
    ttype = rng.integers(0, 2, size=(B, T)).astype(np.int32)
    return objs, triplets, ttype


def test_sg2layout_import_matches_torch():
    from canonicalsg2im_tpu.models.sg2layout import Sg2LayoutModel

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    emb, gdim, hidden, layers = 8, 16, 24, 2
    tm = TorchSg2Layout(VOCAB, emb, gdim, hidden, layers)
    tm.eval()

    params, stats = convert_sg2layout(
        SubDict(_state(tm.state_dict()), set()))
    assert not stats  # mlp_normalization='none': no running stats

    jm = Sg2LayoutModel(vocab=VOCAB, embedding_dim=emb, gconv_dim=gdim,
                        gconv_hidden_dim=hidden, gconv_num_layers=layers,
                        mask_size=0)
    objs, triplets, ttype = _rand_graph(rng, B=2, O=5, T=9)
    variables = jm.init(jax.random.PRNGKey(0), objs, triplets, ttype,
                        train=False)
    merged = overlay_strict(variables["params"], params)
    j_vecs, j_boxes, _ = jm.apply({"params": merged}, objs, triplets, ttype,
                                  train=False)
    with torch.no_grad():
        t_vecs, t_boxes = tm(torch.from_numpy(objs).long(),
                             torch.from_numpy(triplets).long(),
                             torch.from_numpy(ttype))
    np.testing.assert_allclose(np.asarray(j_vecs), t_vecs.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_boxes), t_boxes.numpy(),
                               atol=2e-5)


def test_spade_resblock_import_matches_torch():
    from canonicalsg2im_tpu.models.spade import SPADEResnetBlock

    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    gen = torch.Generator().manual_seed(1)
    fin, fout, S, H = 12, 6, 5, 8
    tm = TorchSPADEResnetBlock(fin, fout, S)
    _randomize_bn_stats(tm, gen)
    _converge_sn(tm)
    tm.eval()

    params, stats = convert_spade_resblock(
        SubDict(_state(tm.state_dict()), set()), use_sn=True)

    jm = SPADEResnetBlock(fin, fout, "spectralspadesyncbatch3x3")
    x = rng.normal(size=(2, H, H, fin)).astype(np.float32)
    seg = rng.normal(size=(2, 2 * H, 2 * H, S)).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0), x, seg, train=False)
    merged_p = overlay_strict(variables["params"], params)
    merged_s = overlay_strict(variables["batch_stats"], stats)
    j_out = jm.apply({"params": merged_p, "batch_stats": merged_s}, x, seg,
                     train=False)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(seg.transpose(0, 3, 1, 2)))
    _allclose(j_out, t_out, atol=5e-4)


def test_generator_import_matches_torch():
    from canonicalsg2im_tpu.models.spade import SPADEGenerator

    torch.manual_seed(2)
    rng = np.random.default_rng(2)
    gen = torch.Generator().manual_seed(2)
    emb, ngf, H = 8, 4, 64
    S = A * emb
    tm = TorchSPADEGenerator(VOCAB["attributes"], emb, ngf, S, sw=H // 32)
    _randomize_bn_stats(tm, gen)
    _converge_sn(tm)
    tm.eval()

    params, stats = convert_generator(
        SubDict(_state(tm.state_dict()), set()), use_sn=True, use_vae=False)

    jm = SPADEGenerator(vocab=VOCAB, embedding_dim=emb, ngf=ngf,
                        image_size=(H, H))
    B, O = 2, 4
    objs = rng.integers(1, 3, size=(B, O, A)).astype(np.int32)
    boxes = np.stack([rng.uniform(0, 0.5, (B, O)),
                      rng.uniform(0, 0.5, (B, O)),
                      rng.uniform(0.2, 0.5, (B, O)),
                      rng.uniform(0.2, 0.5, (B, O))], axis=-1
                     ).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0), objs, boxes, train=False)
    merged_p = overlay_strict(variables["params"], params)
    merged_s = overlay_strict(variables["batch_stats"], stats)
    j_img = jm.apply({"params": merged_p, "batch_stats": merged_s}, objs,
                     boxes, train=False)

    # torch side: same embedding -> same obj_vecs; seg built by the
    # framework's oracle-tested splat on those vectors
    with torch.no_grad():
        t_vecs = tm.attribute_embedding(torch.from_numpy(objs).long())
    from canonicalsg2im_tpu.ops.layout import boxes_to_layout
    seg = boxes_to_layout(jnp.asarray(t_vecs.numpy()), jnp.asarray(boxes),
                          H, H, real_mask=jnp.ones((B, O), jnp.float32))
    with torch.no_grad():
        t_img = tm(torch.from_numpy(
            np.asarray(seg).transpose(0, 3, 1, 2)))
    _allclose(j_img, t_img, atol=2e-3)


def test_multiscale_discriminator_import_matches_torch():
    from canonicalsg2im_tpu.models.discriminators import (
        MultiscaleDiscriminator)

    torch.manual_seed(3)
    rng = np.random.default_rng(3)
    emb, ndf, num_D, n_layers, H = 8, 8, 2, 3, 64
    S = A * emb
    tm = TorchMultiscaleDiscriminator(VOCAB["attributes"], emb, 3 + S, ndf,
                                      num_D, n_layers)
    _converge_sn(tm)
    tm.eval()

    params, stats = convert_multiscale_discriminator(
        SubDict(_state(tm.state_dict()), set()), "spectralinstance")

    jm = MultiscaleDiscriminator(vocab=VOCAB, embedding_dim=emb,
                                 image_size=(H, H), num_D=num_D,
                                 n_layers_D=n_layers, ndf=ndf)
    B, O = 2, 4
    img = rng.normal(size=(B, H, H, 3)).astype(np.float32)
    objs = rng.integers(1, 3, size=(B, O, A)).astype(np.int32)
    boxes = np.stack([rng.uniform(0, 0.5, (B, O)),
                      rng.uniform(0, 0.5, (B, O)),
                      rng.uniform(0.2, 0.5, (B, O)),
                      rng.uniform(0.2, 0.5, (B, O))], axis=-1
                     ).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0), img, objs, boxes, train=False)
    merged_p = overlay_strict(variables["params"], params)
    merged_s = overlay_strict(variables["batch_stats"], stats)
    j_res = jm.apply({"params": merged_p, "batch_stats": merged_s}, img,
                     objs, boxes, train=False)

    # torch side shares the converted embedding through the framework's seg
    seg = jm.apply({"params": merged_p, "batch_stats": merged_s}, objs,
                   boxes, method=MultiscaleDiscriminator.seg_layout)
    x = np.concatenate([img, np.asarray(seg, np.float32)], axis=-1)
    with torch.no_grad():
        t_res = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(j_res) == len(t_res) == num_D
    for js, ts in zip(j_res, t_res):
        assert len(js) == len(ts)
        for jf, tf in zip(js, ts):
            _allclose(jf, tf, atol=1e-3)


def test_ac_discriminator_import_matches_torch():
    from canonicalsg2im_tpu.models.discriminators import AcDiscriminator

    torch.manual_seed(4)
    rng = np.random.default_rng(4)
    gen = torch.Generator().manual_seed(4)
    num_objects = max(VOCAB["object_name_to_idx"].values()) + 1
    tm = TorchAcCropDiscriminator(num_objects)
    _randomize_bn_stats(tm, gen)
    tm.eval()

    params, stats = convert_ac_crop_discriminator(
        SubDict(_state(tm.state_dict()), set()), "batch")

    jm = AcDiscriminator(VOCAB)
    N, sz = 6, 32
    crops = rng.normal(size=(N, sz, sz, 3)).astype(np.float32)
    labels = rng.integers(1, num_objects, size=(N,)).astype(np.int32)
    mask = np.ones((N,), np.float32)
    variables = jm.init(jax.random.PRNGKey(0), crops, labels, mask,
                        train=False)
    merged_p = overlay_strict(variables["params"], params["discriminator"])
    merged_s = overlay_strict(variables["batch_stats"],
                              stats["discriminator"])
    j_scores, j_ac = jm.apply({"params": merged_p, "batch_stats": merged_s},
                              crops, labels, mask, train=False)
    with torch.no_grad():
        t_scores, t_ac = tm.discriminator(
            torch.from_numpy(crops.transpose(0, 3, 1, 2)),
            torch.from_numpy(labels).long())
    np.testing.assert_allclose(np.asarray(j_scores), t_scores.numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(float(j_ac), float(t_ac), atol=1e-4)


def test_full_checkpoint_roundtrip(tmp_path):
    """End-to-end: torch.save a reference-shaped itr_<t>.pt, convert it, and
    check config inference, restore, and output parity for the layout stage."""
    from canonicalsg2im_tpu.config import Config
    from canonicalsg2im_tpu.train.gan import create_gan_states
    from canonicalsg2im_tpu.utils.checkpoint import restore_checkpoint
    from scripts.convert_reference_checkpoint import convert_checkpoint

    torch.manual_seed(5)
    rng = np.random.default_rng(5)
    gen = torch.Generator().manual_seed(5)
    emb, gdim, hidden, layers, ngf, H = 4, 8, 12, 2, 4, 64
    t_layout = TorchSg2Layout(VOCAB, emb, gdim, hidden, layers)
    t_gen = TorchSPADEGenerator(VOCAB["attributes"], emb, ngf, A * emb,
                                sw=H // 32)
    t_d_img = TorchMultiscaleDiscriminator(VOCAB["attributes"], emb,
                                           3 + A * emb, 8, 2, 3)
    num_objects = max(VOCAB["object_name_to_idx"].values()) + 1
    t_d_obj = TorchAcCropDiscriminator(num_objects)
    for m in (t_layout, t_gen, t_d_img, t_d_obj):
        _randomize_bn_stats(m, gen)
        _converge_sn(m)
        m.eval()

    model_state = {}
    model_state.update(_state(t_layout.state_dict(),
                              "sg_to_layout.module."))
    model_state.update(_state(t_gen.state_dict(),
                              "layout_to_image_model.module."))
    ckpt = {
        "model_state": {k: torch.from_numpy(v)
                        for k, v in model_state.items()},
        "d_img_state": t_d_img.state_dict(),
        "d_obj_state": t_d_obj.state_dict(),
        "vocab": VOCAB,
        "counters": {"t": 12345, "epoch": 3},
    }
    pt_path = tmp_path / "itr_12345.pt"
    torch.save(ckpt, pt_path)

    out = convert_checkpoint(str(pt_path), str(tmp_path / "imported"),
                             overrides={"image_size": (H, H),
                                        "compute_dtype": "float32",
                                        "crop_size": 32})
    assert out.endswith("itr_12345.ckpt")

    # inferred hyper-parameters
    cfg = Config.load(str(tmp_path / "imported" / "run_args.json"))
    assert cfg.embedding_dim == emb
    assert cfg.gconv_dim == gdim
    assert cfg.gconv_hidden_dim == hidden
    assert cfg.gconv_num_layers == layers
    assert cfg.ngf == ngf
    assert cfg.num_D == 2 and cfg.n_layers_D == 3 and cfg.ndf == 8
    assert cfg.norm_D == "spectralinstance"
    assert cfg.mask_size == 0

    states = create_gan_states(cfg, jax.random.PRNGKey(0))
    restored, counters = restore_checkpoint(out, like=states)
    assert counters["t"] == 12345 and counters["epoch"] == 3

    # layout-stage output parity through the restored meta model
    objs, triplets, ttype = _rand_graph(rng, B=2, O=5, T=9)
    from canonicalsg2im_tpu.models.meta import MetaGeneratorModel
    meta = MetaGeneratorModel.from_config(cfg)
    img, j_boxes, _ = meta.apply(
        {"params": restored.g.params,
         "batch_stats": restored.g.batch_stats},
        objs, triplets, ttype, train=False)
    with torch.no_grad():
        _, t_boxes = t_layout(torch.from_numpy(objs).long(),
                              torch.from_numpy(triplets).long(),
                              torch.from_numpy(ttype))
    np.testing.assert_allclose(np.asarray(j_boxes), t_boxes.numpy(),
                               atol=2e-5)
    assert img.shape == (2, H, H, 3)


def test_infer_detects_mask_net_and_vae_absence():
    torch.manual_seed(6)
    t_layout = TorchSg2Layout(VOCAB, 4, 8, 12, 2)
    sections = {"model_state": _state(t_layout.state_dict(),
                                      "sg_to_layout.")}
    out = infer_config_overrides(sections)
    assert out["skip_generation"] is True
    assert out["skip_graph_model"] is False
    assert out["mask_size"] == 0
    assert out["mlp_normalization"] == "none"


class TorchMaskNet(tnn.Module):
    """_build_mask_net Sequential (model.py:67-79): per doubling block
    [Interpolate, Conv2d, BatchNorm2d, ReLU], final 1x1 Conv2d."""

    def __init__(self, dim, mask_size):
        super().__init__()
        layers, cur = [], 1
        while cur < mask_size:
            layers += [tnn.Upsample(scale_factor=2, mode="nearest"),
                       tnn.Conv2d(dim, dim, 3, padding=1),
                       tnn.BatchNorm2d(dim), tnn.ReLU()]
            cur *= 2
        layers.append(tnn.Conv2d(dim, 1, 1))
        self.mask_net = tnn.Sequential(*layers)

    def forward(self, x):
        return self.mask_net(x)


def test_mask_net_import_matches_torch():
    from canonicalsg2im_tpu.models.sg2layout import MaskNet
    from scripts.convert_reference_checkpoint import convert_mask_net

    torch.manual_seed(7)
    rng = np.random.default_rng(7)
    gen = torch.Generator().manual_seed(7)
    dim, msize = 10, 8
    tm = TorchMaskNet(dim, msize)
    _randomize_bn_stats(tm, gen)
    tm.eval()

    params, stats = convert_mask_net(
        SubDict(_state(tm.state_dict()), set()).sub("mask_net"))
    jm = MaskNet(dim, msize)
    x = rng.normal(size=(3, 1, 1, dim)).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0), x, train=False)
    mp = overlay_strict(variables["params"], params)
    ms = overlay_strict(variables["batch_stats"], stats)
    j = jm.apply({"params": mp, "batch_stats": ms}, x, train=False)
    with torch.no_grad():
        t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    _allclose(j, t, atol=1e-4)


def test_mask_discriminator_import_overlay_and_forward():
    """Structure-level check for d_mask_state: the converted tree overlays
    strictly onto MultiscaleMaskDiscriminator (numerics of the PatchGAN body
    are covered by the NLayer cases above via the same mapper)."""
    from canonicalsg2im_tpu.models.discriminators import (
        MultiscaleMaskDiscriminator)
    from scripts.convert_reference_checkpoint import (
        convert_mask_discriminator)

    torch.manual_seed(8)
    rng = np.random.default_rng(8)
    num_objects = max(VOCAB["object_name_to_idx"].values()) + 1
    tm = TorchMultiscaleDiscriminator(VOCAB["attributes"], 4,
                                      num_objects + 1, 8, 2, 3)
    _converge_sn(tm)
    tm.eval()
    sd = {k: v for k, v in _state(tm.state_dict()).items()
          if k.startswith("discriminator_")}
    params, stats = convert_mask_discriminator(SubDict(sd, set()),
                                               "spectralinstance")

    jm = MultiscaleMaskDiscriminator(vocab=VOCAB, num_D=2, n_layers_D=3,
                                     ndf=8)
    objs = rng.integers(1, 3, size=(2, 4, A)).astype(np.int32)
    masks = rng.uniform(size=(2, 4, 16, 16)).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0), objs, masks, train=False)
    mp = overlay_strict(variables["params"], params)
    ms = overlay_strict(variables["batch_stats"], stats)
    res, real = jm.apply({"params": mp, "batch_stats": ms}, objs, masks,
                         train=False)
    assert len(res) == 2 and real.shape == (8,)
