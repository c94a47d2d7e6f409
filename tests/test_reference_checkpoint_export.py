"""Golden tests for the reference-checkpoint exporter
(scripts/export_reference_checkpoint.py).

Strategy (inverse of tests/test_reference_checkpoint_import.py, which proves
import == torch forward):
  1. strict=True ``load_state_dict`` of the exported dicts into the torch
     oracle modules whose names replicate the reference's exactly — proves
     every exported name and shape;
  2. torch-forward parity after that load — proves the exported values;
  3. a full save -> export -> re-import round trip through the real .pt
     file — proves export o import == identity on every leaf.

Spectral-norm state is converged in-place before exporting (power iteration
on the raw kernels), mirroring the state a trained checkpoint is in; the
exporter rebuilds torch's ``weight_v`` as normalize(W^T u), which is the
fixed point once u is converged.
"""
import json
import os

import numpy as np
import torch

import jax
import jax.numpy as jnp

from canonicalsg2im_tpu.config import Config
from canonicalsg2im_tpu.data.vocab import build_clevr_vocab

from scripts.export_reference_checkpoint import (
    Flat,
    export_generator,
    export_multiscale_discriminator,
    export_sg2layout,
    export_checkpoint,
)

from test_reference_checkpoint_import import (
    TorchMultiscaleDiscriminator,
    TorchSg2Layout,
    TorchSPADEGenerator,
    _converge_sn,
)

VOCAB = build_clevr_vocab()
A = len(VOCAB["attributes"])


def _converge_sn_states(params, stats, iters=150):
    """Walk a flax (params, batch_stats) tree pair and converge every
    SpectralNorm entry's u (and recompute sigma) against its kernel, in
    place. Keys inside a SpectralNorm_{i} entry look like
    '<local>/kernel/u' with the kernel at params[<local>]['kernel']."""
    for key in list(stats.keys()):
        sub = stats[key]
        if key.startswith("SpectralNorm_") and isinstance(sub, dict):
            u_key = next(k for k in sub if k.endswith("/u"))
            local = u_key.split("/")[0]
            w = np.asarray(params[local]["kernel"], np.float32)
            w_mat = w.transpose(3, 2, 0, 1).reshape(w.shape[3], -1)
            u = np.asarray(sub[u_key], np.float32).reshape(-1)
            for _ in range(iters):
                v = w_mat.T @ u
                v /= max(float(np.linalg.norm(v)), 1e-12)
                u = w_mat @ v
                u /= max(float(np.linalg.norm(u)), 1e-12)
            sub[u_key] = u[None, :].astype(np.float32)
            sub[u_key[:-1] + "sigma"] = np.asarray(
                float(u @ w_mat @ v), np.float32)
        elif isinstance(sub, dict):
            _converge_sn_states(params.get(key, {}), sub, iters)


def _to_torch(flat):
    return {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
            for k, v in flat.items()}


def _tree_leaves(tree, path=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _tree_leaves(tree[k], f"{path}/{k}")
    else:
        yield path, np.asarray(tree)


# ------------------------------------------------- strict naming + forward


def test_export_generator_strict_torch_load_and_forward():
    from canonicalsg2im_tpu.models.spade import SPADEGenerator

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    emb, ngf, H = 8, 4, 64
    S = A * emb

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
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    _converge_sn_states(params, stats)

    out = Flat()
    export_generator(params, stats, out, "", use_sn=True, use_vae=False)

    tm = TorchSPADEGenerator(VOCAB["attributes"], emb, ngf, S, sw=H // 32)
    # strict load proves every exported name and shape
    tm.load_state_dict(_to_torch(out), strict=True)
    tm.eval()

    j_img = jm.apply({"params": params, "batch_stats": stats}, objs, boxes,
                     train=False)
    with torch.no_grad():
        t_vecs = tm.attribute_embedding(torch.from_numpy(objs).long())
    from canonicalsg2im_tpu.ops.layout import boxes_to_layout
    seg = boxes_to_layout(jnp.asarray(t_vecs.numpy()), jnp.asarray(boxes),
                          H, H, real_mask=jnp.ones((B, O), jnp.float32))
    with torch.no_grad():
        t_img = tm(torch.from_numpy(np.asarray(seg).transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(j_img).transpose(0, 3, 1, 2), t_img.numpy(), atol=2e-3)


def test_export_sg2layout_strict_torch_load():
    from canonicalsg2im_tpu.train import create_layout_state

    cfg = Config(vocab=VOCAB, embedding_dim=8, gconv_dim=16,
                 gconv_hidden_dim=24, gconv_num_layers=2)
    cfg.finalize()
    state = create_layout_state(cfg, jax.random.PRNGKey(1))
    out = Flat()
    export_sg2layout(jax.tree.map(np.asarray, state.params),
                     jax.tree.map(np.asarray, state.batch_stats), out, "")
    tm = TorchSg2Layout(VOCAB, 8, 16, 24, 2)
    tm.load_state_dict(_to_torch(out), strict=True)


def test_export_multiscale_discriminator_strict_torch_load():
    from canonicalsg2im_tpu.models.discriminators import (
        MultiscaleDiscriminator)

    emb, H = 8, 64
    S = A * emb
    jm = MultiscaleDiscriminator(vocab=VOCAB, embedding_dim=emb,
                                 image_size=(H, H), num_D=2, n_layers_D=4,
                                 ndf=8)
    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, H, H, 3)).astype(np.float32)
    objs = rng.integers(1, 3, size=(1, 4, A)).astype(np.int32)
    boxes = np.full((1, 4, 4), 0.25, np.float32)
    variables = jm.init(jax.random.PRNGKey(2), img, objs, boxes, train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    _converge_sn_states(params, stats)
    out = Flat()
    export_multiscale_discriminator(params, stats, out, "spectralinstance")
    tm = TorchMultiscaleDiscriminator(VOCAB["attributes"], emb, 3 + S, 8,
                                      num_D=2, n_layers=4)
    _converge_sn(tm)
    tm.load_state_dict(_to_torch(out), strict=True)


# ------------------------------------------------------------- round trips


def _save_framework_checkpoint(tmp_path, cfg, states, t=7):
    from canonicalsg2im_tpu.utils.checkpoint import save_checkpoint

    path = os.path.join(tmp_path, f"itr_{t}.ckpt")
    save_checkpoint(path, states, vocab=cfg.vocab,
                    counters={"t": t, "epoch": 1})
    cfg.save(os.path.join(tmp_path, "run_args.json"))
    return path


def _assert_trees_match(a, b, what, sigma_rtol=1e-4):
    a = dict(zip(*zip(*_tree_leaves(a))))
    b = dict(zip(*zip(*_tree_leaves(b))))
    assert set(a) == set(b), (
        f"{what}: leaf sets differ: {sorted(set(a) ^ set(b))[:6]}")
    for k in a:
        if k.endswith("/sigma"):
            np.testing.assert_allclose(a[k], b[k], rtol=sigma_rtol,
                                       err_msg=f"{what}{k}")
        else:
            np.testing.assert_allclose(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                atol=1e-6, err_msg=f"{what}{k}")


def test_full_gan_export_import_roundtrip(tmp_path):
    from scripts.convert_reference_checkpoint import convert_checkpoint
    from canonicalsg2im_tpu.train.gan import create_gan_states
    from canonicalsg2im_tpu.utils.checkpoint import restore_checkpoint

    tmp_path = str(tmp_path)
    cfg = Config(vocab=VOCAB, dataset="packed_clevr_syn", embedding_dim=8,
                 gconv_dim=16, gconv_hidden_dim=24, gconv_num_layers=2,
                 ngf=4, ndf=8, image_size=(64, 64), batch_size=2,
                 mask_size=16)  # exercises mask_net + d_mask export too
    cfg.finalize()
    states = create_gan_states(cfg, jax.random.PRNGKey(0))

    def conv_state(ts):
        p = jax.tree.map(np.asarray, ts.params)
        s = jax.tree.map(np.asarray, ts.batch_stats)
        _converge_sn_states(p, s)
        return ts.replace(params=p, batch_stats=s)

    states = states.replace(
        g=conv_state(states.g), d_img=conv_state(states.d_img),
        d_obj=conv_state(states.d_obj), d_mask=conv_state(states.d_mask))

    src = _save_framework_checkpoint(tmp_path, cfg, states)
    pt = os.path.join(tmp_path, "exported.pt")
    export_checkpoint(src, pt)

    # the .pt must be a plain torch-loadable file
    payload = torch.load(pt, map_location="cpu", weights_only=False)
    assert set(payload) >= {"model_state", "d_img_state", "d_obj_state",
                            "vocab", "counters"}
    assert payload["counters"]["t"] == 7
    assert any(k.startswith("sg_to_layout.module.")
               for k in payload["model_state"])
    assert any(k.startswith("module.attribute_embedding")
               for k in payload["d_img_state"])

    out2 = os.path.join(tmp_path, "reimported")
    ck2 = convert_checkpoint(pt, out2)
    states2 = create_gan_states(cfg, jax.random.PRNGKey(9))
    states2, counters = restore_checkpoint(ck2, like=states2)
    assert counters["t"] == 7

    _assert_trees_match(states.g.params, states2.g.params, "g")
    _assert_trees_match(states.g.batch_stats, states2.g.batch_stats,
                        "g.stats")
    _assert_trees_match(states.d_img.params, states2.d_img.params, "d_img")
    _assert_trees_match(states.d_img.batch_stats, states2.d_img.batch_stats,
                        "d_img.stats")
    _assert_trees_match(states.d_obj.params, states2.d_obj.params, "d_obj")
    _assert_trees_match(states.d_obj.batch_stats, states2.d_obj.batch_stats,
                        "d_obj.stats")
    assert "d_mask_state" in payload
    _assert_trees_match(states.d_mask.params, states2.d_mask.params, "d_mask")
    _assert_trees_match(states.d_mask.batch_stats,
                        states2.d_mask.batch_stats, "d_mask.stats")


def test_layout_export_roundtrip(tmp_path):
    from canonicalsg2im_tpu.train import create_layout_state

    tmp_path = str(tmp_path)
    cfg = Config(vocab=VOCAB, dataset="packed_clevr_syn", embedding_dim=8,
                 gconv_dim=16, gconv_hidden_dim=24, gconv_num_layers=2,
                 skip_generation=True)
    cfg.finalize()
    state = create_layout_state(cfg, jax.random.PRNGKey(4))
    src = _save_framework_checkpoint(tmp_path, cfg, state, t=3)
    pt = os.path.join(tmp_path, "layout.pt")
    export_checkpoint(src, pt)
    payload = torch.load(pt, map_location="cpu", weights_only=False)
    assert set(payload["model_state"]) and all(
        k.startswith("sg_to_layout.module.") for k in payload["model_state"])
    # strict load into the torch oracle (raw-name export path)
    pt2 = os.path.join(tmp_path, "layout_raw.pt")
    export_checkpoint(src, pt2, dp_wrap=False)
    raw = torch.load(pt2, map_location="cpu", weights_only=False)
    stripped = {k[len("sg_to_layout."):]: v
                for k, v in raw["model_state"].items()}
    tm = TorchSg2Layout(VOCAB, 8, 16, 24, 2)
    tm.load_state_dict(stripped, strict=True)
