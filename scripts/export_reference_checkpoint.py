"""Export this framework's checkpoints to the reference PyTorch format.

The inverse of ``scripts/convert_reference_checkpoint.py``: reads one of this
framework's msgpack checkpoints (``itr_<t>.ckpt`` + ``.vocab.json`` sidecar +
``run_args.json``) and writes a torch-loadable ``itr_<t>.pt`` whose sections
and state-dict names replicate the reference's exactly (``model_state`` with
``sg_to_layout.module.*`` / ``layout_to_image_model.module.*``,
``d_img_state`` / ``d_obj_state`` / ``d_mask_state`` with the DataParallel
``module.`` prefix, plus ``vocab`` and ``counters`` — reference
scripts/train.py:488-519, sg2im/meta_models.py:9-51). A reference user can
take a model trained here back into the reference codebase:

  python -m scripts.export_reference_checkpoint \
      --checkpoint out/run/itr_4000.ckpt --output itr_4000.pt

Conversions per leaf (each the inverse of the importer's):
  - conv kernels   HWIO -> OIHW
  - linear kernels (in, out) -> (out, in)
  - batch norms    scale/bias -> weight/bias; flax ``batch_stats`` ->
                   running_mean/running_var (+ num_batches_tracked = 0)
  - spectral norm  the raw flax kernel -> ``weight_orig``; ``weight_u`` from
                   the flax power-iteration state; ``weight_v`` rebuilt as
                   normalize(W_mat^T u) — exactly the v torch's next power
                   iteration would compute, so a converged checkpoint stays
                   at its fixed point on the torch side too.

Not exported (documented deviations):
  - optimizer moments (torch Adam state is keyed by an internal parameter
    ordering; the reference's own ``restore_checkpoints`` surgery tolerates
    fresh optimizers, scripts/train.py:63-101)
  - the reference's constructed-but-unused ``repr_net`` / ``image_encoder``
    submodules (spade generator.py:50-62, discriminator.py:84-90): load the
    exported dicts with ``strict=False`` (the missing keys are exactly those
    vestigial modules).

torch is imported here only (never inside canonicalsg2im_tpu/ — CLAUDE.md).
Golden round-trip + torch-oracle forward tests:
tests/test_reference_checkpoint_export.py.
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Optional

import numpy as np


# --------------------------------------------------------------- primitives


def _to_np(v) -> np.ndarray:
    return np.asarray(v)


def _conv_kernel(k: np.ndarray) -> np.ndarray:
    """flax HWIO -> torch OIHW."""
    return np.ascontiguousarray(_to_np(k).transpose(3, 2, 0, 1))


def _dense_kernel(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(_to_np(k).T)


class Flat(dict):
    """Flat torch-style state dict under construction."""

    def put(self, key: str, value: np.ndarray):
        if key in self:
            raise KeyError(f"duplicate export key {key!r}")
        self[key] = _to_np(value)


def _plain_conv(p: Dict, out: Flat, key: str):
    out.put(key + ".weight", _conv_kernel(p["kernel"]))
    if "bias" in p:
        out.put(key + ".bias", p["bias"])


def _sn_conv(p: Dict, sn_state: Dict, local: str, out: Flat, key: str):
    """Spectral-normed conv -> weight_orig / weight_u / weight_v.

    ``sn_state`` is the flax ``SpectralNorm_i`` entry holding
    ``{local}/kernel/u`` and ``{local}/kernel/sigma``."""
    w = _conv_kernel(p["kernel"])
    u = _to_np(sn_state[f"{local}/kernel/u"]).reshape(-1).astype(np.float32)
    w_mat = w.reshape(w.shape[0], -1).astype(np.float32)
    v = w_mat.T @ u
    v = v / max(float(np.linalg.norm(v)), 1e-12)
    out.put(key + ".weight_orig", w)
    out.put(key + ".weight_u", u)
    out.put(key + ".weight_v", v.astype(np.float32))
    if "bias" in p:
        out.put(key + ".bias", p["bias"])


def _dense(p: Dict, out: Flat, key: str):
    out.put(key + ".weight", _dense_kernel(p["kernel"]))
    out.put(key + ".bias", p["bias"])


def _embed(p: Dict, out: Flat, key: str):
    out.put(key + ".weight", p["embedding"])


def _batchnorm(p: Optional[Dict], stats: Dict, out: Flat, key: str):
    if p:
        out.put(key + ".weight", p["scale"])
        out.put(key + ".bias", p["bias"])
    out.put(key + ".running_mean", stats["mean"])
    out.put(key + ".running_var", stats["var"])
    out.put(key + ".num_batches_tracked", np.asarray(0, np.int64))


# ----------------------------------------------------------------- modules


def export_attribute_embeddings(p: Dict, out: Flat, pre: str):
    """models/embed.py -> attribute_embed.py:18-29 naming."""
    k = 0
    while f"att_emb_{k}" in p:
        _embed(p[f"att_emb_{k}"], out, f"{pre}att_emb_{k}")
        k += 1
    if "attribute_fc_gen" in p:
        _dense(p["attribute_fc_gen"], out, f"{pre}attribute_fc_gen")


def export_mlp(p: Dict, stats: Dict, out: Flat, pre: str,
               batch_norm: str = "none"):
    """models/layers.MLP -> build_mlp Sequential indices
    (sg2im/layers.py:6-25): Linear at 2i ('none') or 3i ('batch')."""
    step = 3 if batch_norm == "batch" else 2
    i = 0
    while f"Dense_{i}" in p:
        _dense(p[f"Dense_{i}"], out, f"{pre}{step * i}")
        if batch_norm == "batch" and f"BatchNorm_{i}" in p:
            _batchnorm(p[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"], out,
                       f"{pre}{step * i + 1}")
        i += 1


def export_gconv(p: Dict, stats: Dict, out: Flat, pre: str,
                 mlp_normalization: str):
    for net in ("net1", "net2"):
        export_mlp(p[net], stats.get(net, {}), out, f"{pre}{net}.",
                   mlp_normalization)


def export_mask_net(p: Dict, stats: Dict, out: Flat, pre: str):
    """models/sg2layout.MaskNet -> _build_mask_net Sequential indices
    (model.py:67-79): Conv at 4i+1, BatchNorm at 4i+2, final 1x1 Conv at
    4*blocks."""
    i = 0
    while f"BatchNorm_{i}" in p:
        _plain_conv(p[f"Conv_{i}"], out, f"{pre}{4 * i + 1}")
        _batchnorm(p[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"], out,
                   f"{pre}{4 * i + 2}")
        i += 1
    _plain_conv(p[f"Conv_{i}"], out, f"{pre}{4 * i}")


def export_sg2layout(p: Dict, stats: Dict, out: Flat, pre: str,
                     mlp_normalization: str = "none"):
    """models/sg2layout.py -> Sg2LayoutModel naming (model.py:18-79)."""
    out.put(pre + "trans_candidates_weights", p["trans_candidates_weights"])
    out.put(pre + "converse_candidates_weights",
            p["converse_candidates_weights"])
    export_attribute_embeddings(p["attribute_embedding"], out,
                                pre + "attribute_embedding.")
    _embed(p["pred_embeddings"], out, pre + "pred_embeddings")
    i = 0
    while f"gconv_{i}" in p:
        export_gconv(p[f"gconv_{i}"], stats.get(f"gconv_{i}", {}), out,
                     f"{pre}gconvs.{i}.", mlp_normalization)
        i += 1
    export_mlp(p["box_net"], stats.get("box_net", {}), out, pre + "box_net.",
               mlp_normalization)
    if "mask_net" in p:
        export_mask_net(p["mask_net"], stats.get("mask_net", {}), out,
                        pre + "mask_net.")


def export_spade(p: Dict, stats: Dict, out: Flat, pre: str):
    """models/spade.SPADE -> normalization.py:66-110 naming."""
    _plain_conv(p["mlp_shared"], out, pre + "mlp_shared.0")
    _plain_conv(p["mlp_gamma"], out, pre + "mlp_gamma")
    _plain_conv(p["mlp_beta"], out, pre + "mlp_beta")
    pf = stats.get("ParamFreeNorm_0", {}).get("BatchNorm_0")
    if pf is not None:
        _batchnorm(None, pf, out, pre + "param_free_norm")


def export_spade_resblock(p: Dict, stats: Dict, out: Flat, pre: str,
                          use_sn: bool):
    """models/spade.SPADEResnetBlock -> architecture.py:21-47 naming; the
    flax SpectralNorm state order matches the apply order (conv_s if learned
    shortcut, then conv_0, conv_1)."""
    learned_shortcut = "conv_s" in p
    sn_order = (["conv_s"] if learned_shortcut else []) + ["conv_0", "conv_1"]
    for sn_i, name in enumerate(sn_order):
        if use_sn:
            _sn_conv(p[name], stats[f"SpectralNorm_{sn_i}"], name, out,
                     pre + name)
        else:
            _plain_conv(p[name], out, pre + name)
    for name in (["norm_s"] if learned_shortcut else []) + ["norm_0",
                                                            "norm_1"]:
        export_spade(p[name], stats.get(name, {}), out, f"{pre}{name}.")


GENERATOR_BLOCKS = ("head_0", "G_middle_0", "G_middle_1",
                    "up_0", "up_1", "up_2", "up_3", "up_4")


def export_generator(p: Dict, stats: Dict, out: Flat, pre: str, use_sn: bool,
                     use_vae: bool):
    """models/spade.SPADEGenerator -> generator.py:13-127 naming (the unused
    reference repr_net / image_encoder are not emitted — strict=False)."""
    export_attribute_embeddings(p["attribute_embedding"], out,
                                pre + "attribute_embedding.")
    if use_vae:
        _dense(p["fc"], out, pre + "fc")
    else:
        _plain_conv(p["fc"], out, pre + "fc")
    for name in GENERATOR_BLOCKS:
        if name in p:
            export_spade_resblock(p[name], stats.get(name, {}), out,
                                  f"{pre}{name}.", use_sn)
    _plain_conv(p["conv_img"], out, pre + "conv_img")


def export_nlayer_discriminator(p: Dict, stats: Dict, out: Flat, pre: str,
                                norm_D: str):
    """models/discriminators.NLayerDiscriminator -> discriminator.py:164-206
    naming: model0.0 bare first conv, model{n}.0 spectral-normed middles
    (+ model{n}.1 subnorm), model{N}.0 bare head."""
    use_sn = norm_D.startswith("spectral")
    kind = norm_D[len("spectral"):] if use_sn else norm_D
    _plain_conv(p["conv0"], out, pre + "model0.0")
    n = 1
    sn_i = bn_i = 0
    while f"conv{n}" in p:
        if use_sn:
            _sn_conv(p[f"conv{n}"], stats[f"SpectralNorm_{sn_i}"],
                     f"conv{n}", out, f"{pre}model{n}.0")
            sn_i += 1
        else:
            _plain_conv(p[f"conv{n}"], out, f"{pre}model{n}.0")
        if kind in ("batch", "sync_batch"):
            _batchnorm(p[f"BatchNorm_{bn_i}"], stats[f"BatchNorm_{bn_i}"],
                       out, f"{pre}model{n}.1")
            bn_i += 1
        n += 1
    _plain_conv(p["conv_out"], out, f"{pre}model{n}.0")


def export_multiscale_discriminator(p: Dict, stats: Dict, out: Flat,
                                    norm_D: str, pre: str = ""):
    export_attribute_embeddings(p["attribute_embedding"], out,
                                pre + "attribute_embedding.")
    i = 0
    while f"discriminator_{i}" in p:
        export_nlayer_discriminator(
            p[f"discriminator_{i}"], stats.get(f"discriminator_{i}", {}),
            out, f"{pre}discriminator_{i}.", norm_D)
        i += 1


def export_cnn(p: Dict, stats: Dict, out: Flat, pre: str,
               normalization: str = "batch"):
    """models/layers.CNN -> build_cnn Sequential indices
    (sg2im/layers.py:28-112)."""
    step = 2 if normalization == "none" else 3
    i = 0
    while f"Conv_{i}" in p:
        _plain_conv(p[f"Conv_{i}"], out, f"{pre}{step * i}")
        if normalization == "batch" and f"BatchNorm_{i}" in p:
            _batchnorm(p[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"], out,
                       f"{pre}{step * i + 1}")
        i += 1


def export_ac_crop_discriminator(p: Dict, stats: Dict, out: Flat,
                                 normalization: str = "batch",
                                 pre: str = ""):
    """models/discriminators.AcCropDiscriminator ->
    discriminator.py:209-261 naming."""
    inner = p["discriminator"]
    inner_stats = stats.get("discriminator", {})
    export_cnn(inner["CNN_0"], inner_stats.get("CNN_0", {}), out,
               pre + "discriminator.cnn.0.", normalization)
    _dense(inner["Dense_0"], out, pre + "discriminator.cnn.2")
    _dense(inner["real_classifier"], out, pre + "discriminator.real_classifier")
    _dense(inner["obj_classifier"], out, pre + "discriminator.obj_classifier")


def export_mask_discriminator(p: Dict, stats: Dict, out: Flat, norm_D: str,
                              pre: str = ""):
    """models/discriminators.MultiscaleMaskDiscriminator (PatchGAN body
    nested under 'body') -> discriminator.py:264-356 naming."""
    i = 0
    while f"discriminator_{i}" in p:
        export_nlayer_discriminator(
            p[f"discriminator_{i}"]["body"],
            stats.get(f"discriminator_{i}", {}).get("body", {}),
            out, f"{pre}discriminator_{i}.", norm_D)
        i += 1


# ------------------------------------------------------------ checkpoint IO


def _torchify(flat: Dict[str, np.ndarray]):
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(
        np.asarray(v, np.float32) if np.asarray(v).dtype != np.int64
        else np.asarray(v)).copy())
        for k, v in flat.items()}


def export_checkpoint(checkpoint: str, output: str,
                      dp_wrap: bool = True) -> str:
    """Full export: <dir>/itr_<t>.ckpt -> reference-format .pt file.

    ``dp_wrap`` reproduces the DataParallel naming the reference writes
    (``sg_to_layout.module.*`` inside model_state, ``module.*`` on the
    discriminator sections — what the importer strips on the way in)."""
    import jax
    import torch

    from canonicalsg2im_tpu.config import Config
    from canonicalsg2im_tpu.utils.checkpoint import restore_checkpoint

    run_args = os.path.join(os.path.dirname(checkpoint), "run_args.json")
    cfg = Config.load(run_args)
    vocab_path = checkpoint + ".vocab.json"
    with open(vocab_path) as f:
        vocab = json.load(f)
    cfg.vocab = vocab
    cfg.finalize()

    use_sn = "spectral" in cfg.norm_G
    mmod = ".module." if dp_wrap else "."
    dpre = "module." if dp_wrap else ""

    sections: Dict[str, Dict] = {}
    model_state = Flat()
    if cfg.skip_generation:
        from canonicalsg2im_tpu.train import create_layout_state

        state = create_layout_state(cfg, jax.random.PRNGKey(0))
        state, counters = restore_checkpoint(checkpoint, like=state)
        export_sg2layout(state.params, state.batch_stats, model_state,
                         f"sg_to_layout{mmod}", cfg.mlp_normalization)
    else:
        from canonicalsg2im_tpu.train.gan import create_gan_states

        states = create_gan_states(cfg, jax.random.PRNGKey(0))
        states, counters = restore_checkpoint(checkpoint, like=states)
        gp, gs = states.g.params, states.g.batch_stats
        if "sg_to_layout" in gp:
            export_sg2layout(gp["sg_to_layout"],
                             gs.get("sg_to_layout", {}), model_state,
                             f"sg_to_layout{mmod}", cfg.mlp_normalization)
        if "layout_to_image_model" in gp:
            export_generator(gp["layout_to_image_model"],
                             gs.get("layout_to_image_model", {}), model_state,
                             f"layout_to_image_model{mmod}", use_sn,
                             cfg.use_vae)
        if states.d_img is not None:
            f = Flat()
            export_multiscale_discriminator(
                states.d_img.params, states.d_img.batch_stats, f,
                cfg.norm_D, dpre)
            sections["d_img_state"] = f
        if states.d_obj is not None:
            f = Flat()
            export_ac_crop_discriminator(
                states.d_obj.params, states.d_obj.batch_stats, f,
                cfg.d_normalization, dpre)
            sections["d_obj_state"] = f
        if getattr(states, "d_mask", None) is not None:
            f = Flat()
            export_mask_discriminator(
                states.d_mask.params, states.d_mask.batch_stats, f,
                cfg.norm_D, dpre)
            sections["d_mask_state"] = f
    sections["model_state"] = model_state

    payload = {name: _torchify(flat) for name, flat in sections.items()}
    payload["vocab"] = vocab
    payload["counters"] = {"t": int(counters.get("t", 0)),
                           "epoch": int(counters.get("epoch", 0))}
    os.makedirs(os.path.dirname(os.path.abspath(output)), exist_ok=True)
    torch.save(payload, output)
    return output


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--checkpoint", required=True,
                    help="this framework's itr_<t>.ckpt (with .vocab.json "
                    "sidecar and run_args.json next to it)")
    ap.add_argument("--output", required=True, help="output .pt path")
    ap.add_argument("--raw_names", action="store_true",
                    help="emit names without the DataParallel 'module.' "
                    "wrapping")
    args = ap.parse_args(argv)
    path = export_checkpoint(args.checkpoint, args.output,
                             dp_wrap=not args.raw_names)
    print("wrote", path)


if __name__ == "__main__":
    from canonicalsg2im_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    main()
