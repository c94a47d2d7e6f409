"""Import reference PyTorch checkpoints into this framework.

The reference saves ``itr_<t>.pt`` dicts (reference scripts/train.py:488-519)
holding torch ``state_dict``s for the MetaGeneratorModel (key
``model_state``: ``sg_to_layout.module.*`` + ``layout_to_image_model.module.*``,
meta_models.py:9-51), the image/object/mask discriminators (``d_img_state``,
``d_obj_state``, ``d_mask_state``), the vocab, and step counters. This tool
converts one into this framework's msgpack checkpoint so users can bring
their trained reference models across:

  python -m scripts.convert_reference_checkpoint \
      --checkpoint itr_100000.pt --output out/imported

Conversions applied per leaf:
  - conv kernels   OIHW -> HWIO
  - linear kernels (out, in) -> (in, out)
  - embeddings, biases, canonicalization weight matrices: copied as-is
  - batch norms    weight/bias -> scale/bias params; running stats ->
                   flax ``batch_stats``
  - spectral norm  ``weight_orig`` -> the raw flax kernel; the power-iteration
                   state (u, sigma) is rebuilt from torch's stored
                   ``weight_u``/``weight_v`` buffers with sigma = u . W_mat . v
                   (what torch's eval-mode spectral_norm normalizes by).
                   flax's SpectralNorm re-runs one power-iteration step from
                   the imported u at every apply; on a trained checkpoint u/v
                   are converged (they update every training forward), so that
                   step is a fixed-point no-op and outputs match numerically
                   (proven in tests/test_reference_checkpoint_import.py)

Name translation mirrors the reference module trees exactly (naming source:
sg2im/model.py:18-79, sg2im/graph.py:17-43, sg2im/attribute_embed.py:18-29,
spade/models/networks/generator.py:13-63, architecture.py:21-47,
normalization.py:66-110, discriminator.py:66-356, sg2im/layers.py:6-112).
Model hyper-parameters (embedding_dim, gconv dims/layers, ngf, num_D, ...)
are inferred from the weight shapes where possible.

Optimizer states are NOT imported: the reference's Adam moments are keyed by
a torch-internal parameter ordering; fresh optimizers match the reference's
own ``restore_checkpoints`` surgery behavior (scripts/train.py:63-101).

torch is imported here only (never inside canonicalsg2im_tpu/ — CLAUDE.md).
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Optional, Tuple

import numpy as np


# --------------------------------------------------------------- primitives


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d OIHW -> flax HWIO."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


class SubDict:
    """View over a flat torch state_dict with consumed-key tracking, so the
    converter can prove it mapped (or deliberately skipped) every tensor."""

    def __init__(self, flat: Dict[str, np.ndarray], consumed: set,
                 prefix: str = ""):
        self._flat = flat
        self._consumed = consumed
        self._prefix = prefix

    def sub(self, name: str) -> "SubDict":
        return SubDict(self._flat, self._consumed, self._prefix + name + ".")

    def take(self, key: str) -> np.ndarray:
        full = self._prefix + key
        if full not in self._flat:
            raise KeyError(f"reference checkpoint is missing {full!r}")
        self._consumed.add(full)
        return self._flat[full]

    def has(self, key: str) -> bool:
        return self._prefix + key in self._flat

    def skip_module(self, name: str) -> int:
        """Mark every key under ``name.`` consumed (constructed-but-unused
        reference modules, e.g. repr_net/image_encoder)."""
        pre = self._prefix + name + "."
        n = 0
        for k in self._flat:
            if k.startswith(pre):
                self._consumed.add(k)
                n += 1
        return n

    def keys(self):
        return [k[len(self._prefix):] for k in self._flat
                if k.startswith(self._prefix)]


def _plain_conv(sd: SubDict, key: str, bias: bool = True) -> Dict:
    out = {"kernel": _conv_kernel(sd.take(key + ".weight"))}
    if bias:
        out["bias"] = sd.take(key + ".bias")
    return out


def _sn_conv(sd: SubDict, key: str, bias: bool = True,
             local: Optional[str] = None) -> Tuple[Dict, Dict]:
    """Spectral-normed conv -> (params, sn_state). ``local`` is the flax-side
    layer name embedded in the SpectralNorm state keys."""
    w = sd.take(key + ".weight_orig")
    u = sd.take(key + ".weight_u").astype(np.float32)
    v = sd.take(key + ".weight_v").astype(np.float32)
    w_mat = w.reshape(w.shape[0], -1).astype(np.float32)
    sigma = float(u @ w_mat @ v)
    params = {"kernel": _conv_kernel(w)}
    if bias:
        params["bias"] = sd.take(key + ".bias")
    local = local or key
    state = {f"{local}/kernel/u": u[None, :].astype(np.float32),
             f"{local}/kernel/sigma": np.asarray(sigma, np.float32)}
    return params, state


def _dense(sd: SubDict, key: str) -> Dict:
    return {"kernel": _dense_kernel(sd.take(key + ".weight")),
            "bias": sd.take(key + ".bias")}


def _embed(sd: SubDict, key: str) -> Dict:
    return {"embedding": sd.take(key + ".weight")}


def _batchnorm(sd: SubDict, key: str, affine: bool = True) -> Tuple[Dict, Dict]:
    params = {}
    if affine:
        params = {"scale": sd.take(key + ".weight"),
                  "bias": sd.take(key + ".bias")}
    stats = {"mean": sd.take(key + ".running_mean"),
             "var": sd.take(key + ".running_var")}
    if sd.has(key + ".num_batches_tracked"):
        sd.take(key + ".num_batches_tracked")  # consumed, flax has no analogue
    return params, stats


# ----------------------------------------------------------------- modules


def convert_attribute_embeddings(sd: SubDict) -> Dict:
    """AttributeEmbeddings (attribute_embed.py:18-29) -> models/embed.py."""
    params = {}
    k = 0
    while sd.has(f"att_emb_{k}.weight"):
        params[f"att_emb_{k}"] = _embed(sd, f"att_emb_{k}")
        k += 1
    if sd.has("attribute_fc_gen.weight"):
        params["attribute_fc_gen"] = _dense(sd, "attribute_fc_gen")
    return params


def convert_mlp(sd: SubDict, batch_norm: str = "none") -> Tuple[Dict, Dict]:
    """build_mlp Sequential (sg2im/layers.py:6-25) -> models/layers.MLP.

    'none': Linear at 2i; 'batch': Linear at 3i, BatchNorm1d at 3i+1."""
    params, stats = {}, {}
    step = 3 if batch_norm == "batch" else 2
    i = 0
    while sd.has(f"{step * i}.weight"):
        params[f"Dense_{i}"] = _dense(sd, str(step * i))
        if batch_norm == "batch" and sd.has(f"{step * i + 1}.running_mean"):
            p, s = _batchnorm(sd, str(step * i + 1))
            params[f"BatchNorm_{i}"] = p
            stats[f"BatchNorm_{i}"] = s
        i += 1
    return params, stats


def convert_gconv(sd: SubDict, mlp_normalization: str) -> Tuple[Dict, Dict]:
    """GraphTripleConv (graph.py:17-43) -> models/gcn.py."""
    params, stats = {}, {}
    for net in ("net1", "net2"):
        p, s = convert_mlp(sd.sub(net), mlp_normalization)
        params[net] = p
        if s:
            stats[net] = s
    return params, stats


def convert_mask_net(sd: SubDict) -> Tuple[Dict, Dict]:
    """_build_mask_net Sequential (model.py:67-79): per doubling block
    [Interpolate, Conv2d(4i+1), BatchNorm2d(4i+2), ReLU], then a final 1x1
    Conv2d at index 4k -> models/sg2layout.MaskNet (Conv_i/BatchNorm_i)."""
    params, stats = {}, {}
    i = 0
    while sd.has(f"{4 * i + 1}.weight"):
        params[f"Conv_{i}"] = _plain_conv(sd, str(4 * i + 1))
        p, s = _batchnorm(sd, str(4 * i + 2))
        params[f"BatchNorm_{i}"] = p
        stats[f"BatchNorm_{i}"] = s
        i += 1
    params[f"Conv_{i}"] = _plain_conv(sd, str(4 * i))
    return params, stats


def convert_sg2layout(sd: SubDict, mlp_normalization: str = "none"
                      ) -> Tuple[Dict, Dict]:
    """Sg2LayoutModel (model.py:18-79) -> models/sg2layout.py."""
    params = {
        "trans_candidates_weights": sd.take("trans_candidates_weights"),
        "converse_candidates_weights": sd.take("converse_candidates_weights"),
        "attribute_embedding": convert_attribute_embeddings(
            sd.sub("attribute_embedding")),
        "pred_embeddings": _embed(sd, "pred_embeddings"),
    }
    stats = {}
    i = 0
    while sd.has(f"gconvs.{i}.net1.0.weight"):
        p, s = convert_gconv(sd.sub(f"gconvs.{i}"), mlp_normalization)
        params[f"gconv_{i}"] = p
        if s:
            stats[f"gconv_{i}"] = s
        i += 1
    p, s = convert_mlp(sd.sub("box_net"), mlp_normalization)
    params["box_net"] = p
    if s:
        stats["box_net"] = s
    if sd.has("mask_net.1.weight"):
        p, s = convert_mask_net(sd.sub("mask_net"))
        params["mask_net"] = p
        stats["mask_net"] = s
    return params, stats


def convert_spade(sd: SubDict) -> Tuple[Dict, Dict]:
    """SPADE norm (normalization.py:66-110) -> models/spade.SPADE.
    param_free_norm is affine-free; mlp_shared is Sequential(Conv, ReLU)."""
    params = {
        "mlp_shared": _plain_conv(sd, "mlp_shared.0"),
        "mlp_gamma": _plain_conv(sd, "mlp_gamma"),
        "mlp_beta": _plain_conv(sd, "mlp_beta"),
    }
    stats = {}
    if sd.has("param_free_norm.running_mean"):
        _, s = _batchnorm(sd, "param_free_norm", affine=False)
        stats["ParamFreeNorm_0"] = {"BatchNorm_0": s}
    return params, stats


def convert_spade_resblock(sd: SubDict, use_sn: bool) -> Tuple[Dict, Dict]:
    """SPADEResnetBlock (architecture.py:21-47) -> models/spade.py.

    flax SpectralNorm state order matches the apply order in
    SPADEResnetBlock.__call__: conv_s (if learned shortcut), conv_0, conv_1."""
    learned_shortcut = sd.has("conv_s.weight") or sd.has("conv_s.weight_orig")
    params, stats = {}, {}
    sn_order = (["conv_s"] if learned_shortcut else []) + ["conv_0", "conv_1"]
    sn_i = 0
    for name in sn_order:
        bias = name != "conv_s"  # conv_s is bias-free (architecture.py:32)
        if use_sn:
            p, s = _sn_conv(sd, name, bias=bias)
            params[name] = p
            stats[f"SpectralNorm_{sn_i}"] = s
            sn_i += 1
        else:
            params[name] = _plain_conv(sd, name, bias=bias)
    norm_names = (["norm_s"] if learned_shortcut else []) + ["norm_0", "norm_1"]
    for name in norm_names:
        p, s = convert_spade(sd.sub(name))
        params[name] = p
        if s:
            stats[name] = s
    return params, stats


GENERATOR_BLOCKS = ("head_0", "G_middle_0", "G_middle_1",
                    "up_0", "up_1", "up_2", "up_3", "up_4")


def convert_generator(sd: SubDict, use_sn: bool, use_vae: bool
                      ) -> Tuple[Dict, Dict]:
    """SPADEGenerator (generator.py:13-127) -> models/spade.SPADEGenerator.
    The constructed-but-unused repr_net / image_encoder (generator.py:50-62)
    are skipped."""
    params = {"attribute_embedding": convert_attribute_embeddings(
        sd.sub("attribute_embedding"))}
    stats = {}
    if use_vae:
        params["fc"] = _dense(sd, "fc")
    else:
        params["fc"] = _plain_conv(sd, "fc")
    for name in GENERATOR_BLOCKS:
        if not (sd.has(name + ".conv_0.weight")
                or sd.has(name + ".conv_0.weight_orig")):
            continue
        p, s = convert_spade_resblock(sd.sub(name), use_sn)
        params[name] = p
        if s:
            stats[name] = s
    params["conv_img"] = _plain_conv(sd, "conv_img")
    sd.skip_module("repr_net")
    sd.skip_module("image_encoder")
    return params, stats


def convert_nlayer_discriminator(sd: SubDict, norm_D: str
                                 ) -> Tuple[Dict, Dict]:
    """NLayerDiscriminator (discriminator.py:164-206) -> models/discriminators.

    torch names: model0.0 (bare first conv), model{n}.0 spectral-normed +
    optional model{n}.1 subnorm for the middle layers, model{N}.0 bare output
    head (get_nonspade_norm_layer wraps only the middle convs)."""
    use_sn = norm_D.startswith("spectral")
    kind = norm_D[len("spectral"):] if use_sn else norm_D
    params = {"conv0": _plain_conv(sd, "model0.0")}
    stats = {}
    n = 1
    sn_i = bn_i = 0
    while sd.has(f"model{n + 1}.0.weight") or sd.has(
            f"model{n + 1}.0.weight_orig"):
        # middle conv: bias removed when a subnorm follows
        # (normalization.py:33-37)
        bias = kind in ("none", "")
        if use_sn:
            p, s = _sn_conv(sd, f"model{n}.0", bias=bias, local=f"conv{n}")
            params[f"conv{n}"] = p
            stats[f"SpectralNorm_{sn_i}"] = s
            sn_i += 1
        else:
            params[f"conv{n}"] = _plain_conv(sd, f"model{n}.0", bias=bias)
        if kind in ("batch", "sync_batch"):
            p, s = _batchnorm(sd, f"model{n}.1")
            params[f"BatchNorm_{bn_i}"] = p
            stats[f"BatchNorm_{bn_i}"] = s
            bn_i += 1
        n += 1
    params["conv_out"] = _plain_conv(sd, f"model{n}.0")
    return params, stats


def convert_multiscale_discriminator(sd: SubDict, norm_D: str
                                     ) -> Tuple[Dict, Dict]:
    """MultiscaleDiscriminator (discriminator.py:66-131)."""
    params = {"attribute_embedding": convert_attribute_embeddings(
        sd.sub("attribute_embedding"))}
    stats = {}
    i = 0
    while sd.has(f"discriminator_{i}.model0.0.weight"):
        p, s = convert_nlayer_discriminator(sd.sub(f"discriminator_{i}"),
                                            norm_D)
        params[f"discriminator_{i}"] = p
        if s:
            stats[f"discriminator_{i}"] = s
        i += 1
    sd.skip_module("repr_net")
    sd.skip_module("image_encoder")
    return params, stats


def convert_cnn(sd: SubDict, normalization: str = "batch") -> Tuple[Dict, Dict]:
    """build_cnn Sequential (sg2im/layers.py:28-112) -> models/layers.CNN.
    With a norm: Conv at 3i, norm at 3i+1 (norm+act precede every conv but
    the first); without: Conv at 2i."""
    params, stats = {}, {}
    step = 2 if normalization == "none" else 3
    i = 0
    while sd.has(f"{step * i}.weight"):
        params[f"Conv_{i}"] = _plain_conv(sd, str(step * i))
        if normalization == "batch" and sd.has(f"{step * i + 1}.running_mean"):
            p, s = _batchnorm(sd, str(step * i + 1))
            params[f"BatchNorm_{i}"] = p
            stats[f"BatchNorm_{i}"] = s
        i += 1
    return params, stats


def convert_ac_crop_discriminator(sd: SubDict, normalization: str = "batch"
                                  ) -> Tuple[Dict, Dict]:
    """AcCropDiscriminator / AcDiscriminator (discriminator.py:209-261):
    cnn = Sequential(build_cnn, GlobalAvgPool, Linear) + two heads."""
    inner = sd.sub("discriminator")
    cnn_p, cnn_s = convert_cnn(inner.sub("cnn.0"), normalization)
    params = {"discriminator": {
        "CNN_0": cnn_p,
        "Dense_0": _dense(inner, "cnn.2"),
        "real_classifier": _dense(inner, "real_classifier"),
        "obj_classifier": _dense(inner, "obj_classifier"),
    }}
    stats = {"discriminator": {"CNN_0": cnn_s}} if cnn_s else {}
    return params, stats


def convert_mask_discriminator(sd: SubDict, norm_D: str) -> Tuple[Dict, Dict]:
    """MultiscaleMaskDiscriminator2 (discriminator.py:264-356); this
    framework nests the PatchGAN body under 'body'."""
    params, stats = {}, {}
    i = 0
    while sd.has(f"discriminator_{i}.model0.0.weight"):
        p, s = convert_nlayer_discriminator(sd.sub(f"discriminator_{i}"),
                                            norm_D)
        params[f"discriminator_{i}"] = {"body": p}
        if s:
            stats[f"discriminator_{i}"] = {"body": s}
        i += 1
    return params, stats


def convert_meta_generator(sd: SubDict, mlp_normalization: str, use_sn: bool,
                           use_vae: bool) -> Tuple[Dict, Dict]:
    """MetaGeneratorModel 'model_state' (meta_models.py:9-51)."""
    params, stats = {}, {}
    if sd.has("sg_to_layout.attribute_embedding.att_emb_0.weight"):
        p, s = convert_sg2layout(sd.sub("sg_to_layout"), mlp_normalization)
        params["sg_to_layout"] = p
        if s:
            stats["sg_to_layout"] = s
    if sd.has("layout_to_image_model.conv_img.weight"):
        p, s = convert_generator(sd.sub("layout_to_image_model"), use_sn,
                                 use_vae)
        params["layout_to_image_model"] = p
        if s:
            stats["layout_to_image_model"] = s
    return params, stats


# ------------------------------------------------------------- tree overlay


def overlay_strict(dst, src, path: str = ""):
    """Replace dst leaves with src leaves; every src leaf must exist in dst
    with an identical shape (catches naming or architecture mismatches)."""
    out = dict(dst)
    for k, v in src.items():
        here = f"{path}/{k}"
        if k not in dst:
            raise KeyError(f"converted key {here} not present in the "
                           f"framework model (have: {sorted(dst)[:8]}...)")
        if isinstance(v, dict):
            if not isinstance(dst[k], dict):
                raise KeyError(f"{here}: dict vs leaf mismatch")
            out[k] = overlay_strict(dst[k], v, here)
        else:
            have = np.shape(dst[k])
            want = np.shape(v)
            if tuple(have) != tuple(want):
                raise ValueError(f"{here}: shape {want} does not match the "
                                 f"framework model's {have}")
            out[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)
    return out


# ------------------------------------------------------------ checkpoint IO


def load_reference_checkpoint(path: str):
    """-> (flat numpy state dicts by section, vocab, counters)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sections = {}
    for name in ("model_state", "d_img_state", "d_obj_state", "d_mask_state"):
        sd = ckpt.get(name)
        if sd is None:
            continue
        flat = {}
        for k, v in sd.items():
            k = k.replace(".module.", ".").removeprefix("module.")
            flat[k] = v.detach().cpu().numpy()
        sections[name] = flat
    vocab = ckpt.get("vocab")
    counters = ckpt.get("counters", {"t": 0, "epoch": 0})
    return sections, vocab, counters


def infer_config_overrides(sections: Dict[str, Dict[str, np.ndarray]]) -> Dict:
    """Read model hyper-parameters out of the weight shapes."""
    out: Dict = {}
    ms = sections.get("model_state", {})
    emb = ms.get("sg_to_layout.attribute_embedding.att_emb_0.weight")
    if emb is None:
        emb = ms.get("layout_to_image_model.attribute_embedding."
                     "att_emb_0.weight")
    if emb is not None:
        out["embedding_dim"] = int(emb.shape[1])
    if "sg_to_layout.gconvs.0.net1.0.weight" in ms:
        out["gconv_hidden_dim"] = int(
            ms["sg_to_layout.gconvs.0.net1.0.weight"].shape[0])
        out["gconv_dim"] = int(
            ms["sg_to_layout.gconvs.0.net2.2.weight"].shape[0])
        n = 0
        while f"sg_to_layout.gconvs.{n}.net1.0.weight" in ms:
            n += 1
        out["gconv_num_layers"] = n
        out["skip_graph_model"] = False
        out["mlp_normalization"] = (
            "batch" if "sg_to_layout.box_net.1.running_mean" in ms else "none")
        blocks = 0
        while f"sg_to_layout.mask_net.{4 * blocks + 1}.weight" in ms:
            blocks += 1
        out["mask_size"] = 2 ** blocks if blocks else 0
        if blocks:
            conv0_in = ms["sg_to_layout.mask_net.1.weight"].shape[1]
            out["mask_noise_dim"] = int(conv0_in - out["gconv_dim"])
    else:
        out["skip_graph_model"] = True
    fc = ms.get("layout_to_image_model.fc.weight")
    if fc is not None:
        out["skip_generation"] = False
        out["use_vae"] = fc.ndim == 2
        # 16*ngf output channels either way (generator.py:23-28)
        out["ngf"] = int(fc.shape[0] // 16)
        sn = "layout_to_image_model.head_0.conv_0.weight_orig" in ms
        out["norm_G"] = ("spectralspadesyncbatch3x3" if sn
                         else "spadesyncbatch3x3")
        out["num_upsampling_layers"] = (
            "most" if "layout_to_image_model.up_4.conv_0.weight" in ms
            or "layout_to_image_model.up_4.conv_0.weight_orig" in ms
            else "normal")
    else:
        out["skip_generation"] = True
    di = sections.get("d_img_state", {})
    if di:
        n_d = 0
        while f"discriminator_{n_d}.model0.0.weight" in di:
            n_d += 1
        out["num_D"] = n_d
        layers = 0
        while (f"discriminator_0.model{layers + 1}.0.weight" in di
               or f"discriminator_0.model{layers + 1}.0.weight_orig" in di):
            layers += 1
        out["n_layers_D"] = layers
        out["ndf"] = int(di["discriminator_0.model0.0.weight"].shape[0])
        sn = any(k.endswith("weight_orig") for k in di)
        bn = any(".1.running_mean" in k for k in di)
        out["norm_D"] = (("spectral" if sn else "")
                         + ("batch" if bn else "instance"))
    do = sections.get("d_obj_state", {})
    if do:
        out["use_img_disc"] = False
        out["d_normalization"] = (
            "batch" if "discriminator.cnn.0.1.running_mean" in do else "none")
    return out


def convert_checkpoint(checkpoint: str, output_dir: str, t: Optional[int] = None,
                       overrides: Optional[Dict] = None) -> str:
    """Full conversion: reference .pt -> <output_dir>/itr_<t>.ckpt (+ vocab +
    run_args.json). Returns the checkpoint path."""
    import jax

    from canonicalsg2im_tpu.config import Config
    from canonicalsg2im_tpu.train.gan import create_gan_states
    from canonicalsg2im_tpu.utils.checkpoint import save_checkpoint

    sections, vocab, counters = load_reference_checkpoint(checkpoint)
    if vocab is None:
        raise ValueError(f"{checkpoint} carries no vocab; pass a reference "
                         "checkpoint saved by scripts/train.py")
    inferred = infer_config_overrides(sections)
    inferred.update(overrides or {})
    cfg = Config(vocab=vocab, **inferred)

    consumed: set = set()
    ms = SubDict(sections.get("model_state", {}), consumed)
    use_sn = "spectral" in cfg.norm_G
    g_params, g_stats = convert_meta_generator(
        ms, cfg.mlp_normalization, use_sn, cfg.use_vae)

    states = create_gan_states(cfg, jax.random.PRNGKey(0))
    g = states.g.replace(
        params=overlay_strict(states.g.params, g_params, "g"),
        batch_stats=overlay_strict(states.g.batch_stats, g_stats, "g.stats"))
    new = {"g": g}
    if "d_img_state" in sections and states.d_img is not None:
        di = SubDict(sections["d_img_state"], set())
        p, s = convert_multiscale_discriminator(di, cfg.norm_D)
        new["d_img"] = states.d_img.replace(
            params=overlay_strict(states.d_img.params, p, "d_img"),
            batch_stats=overlay_strict(states.d_img.batch_stats, s,
                                       "d_img.stats"))
    if "d_obj_state" in sections and states.d_obj is not None:
        do = SubDict(sections["d_obj_state"], set())
        p, s = convert_ac_crop_discriminator(do, cfg.d_normalization)
        new["d_obj"] = states.d_obj.replace(
            params=overlay_strict(states.d_obj.params, p, "d_obj"),
            batch_stats=overlay_strict(states.d_obj.batch_stats, s,
                                       "d_obj.stats"))
    if "d_mask_state" in sections and states.d_mask is not None:
        dm = SubDict(sections["d_mask_state"], set())
        p, s = convert_mask_discriminator(dm, cfg.norm_D)
        new["d_mask"] = states.d_mask.replace(
            params=overlay_strict(states.d_mask.params, p, "d_mask"),
            batch_stats=overlay_strict(states.d_mask.batch_stats, s,
                                       "d_mask.stats"))
    states = states.replace(**new)

    step = t if t is not None else int(counters.get("t", 0))
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"itr_{step}.ckpt")
    save_checkpoint(path, states, vocab=vocab,
                    counters={"t": step, "epoch": counters.get("epoch", 0)})
    cfg.save(os.path.join(output_dir, "run_args.json"))

    unconverted = [k for k in sections.get("model_state", {})
                   if k not in consumed]
    if unconverted:
        print(f"note: {len(unconverted)} model_state tensors were not "
              f"imported (first few: {unconverted[:5]})")
    return path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--checkpoint", required=True,
                    help="reference itr_<t>.pt file")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--t", type=int, default=None,
                    help="override the imported step counter")
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                    help="Config overrides the weights cannot express "
                    "(e.g. image_size=256,256 crop_size=64)")
    args = ap.parse_args(argv)
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            overrides[k] = json.loads(v)
        except json.JSONDecodeError:
            overrides[k] = v
    path = convert_checkpoint(args.checkpoint, args.output, args.t, overrides)
    print("wrote", path)


if __name__ == "__main__":
    from canonicalsg2im_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    main()
