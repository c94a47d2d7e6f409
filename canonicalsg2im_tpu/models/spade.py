"""AttSPADE generator stack (reference `spade/models/networks/{normalization,
architecture,generator,encoder}.py`), in flax / NHWC.

TPU-native notes:
- 'syncbatch' normalization is a plain flax BatchNorm: under a jit whose batch
  is sharded over the data mesh axis, XLA computes the batch statistics with a
  global all-reduce — the entire 638-LoC sync_batchnorm package of the
  reference collapses into this (SURVEY.md §2.9).
- Spectral norm is ``nn.SpectralNorm`` (power iteration state in the
  'batch_stats' collection), replacing torch's hook-based implementation.
- The layout `seg` is built by the closed-form splat ops (see ops/layout.py)
  over the full fixed-shape object set; dummy objects are excluded via a mask
  instead of the reference's dynamic `remove_dummy_objects` filtering.
"""
from __future__ import annotations

import re
from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from canonicalsg2im_tpu.models.embed import AttributeEmbeddings
from canonicalsg2im_tpu.models.layers import (
    CNN,
    MLP,
    get_activation,
    resize_nearest,
    upsample_nearest,
)
from canonicalsg2im_tpu.ops.layout import boxes_to_layout, masks_to_layout


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class ParamFreeNorm(nn.Module):
    """The parameter-free half of SPADE: syncbatch/batch/instance, no affine
    (normalization.py:75-83)."""

    kind: str  # 'syncbatch' | 'batch' | 'instance'

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.kind in ("syncbatch", "batch"):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, use_bias=False, use_scale=False)(x)
        if self.kind == "instance":
            mean = x.mean(axis=(1, 2), keepdims=True)
            var = x.var(axis=(1, 2), keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)
        raise ValueError(f"{self.kind} is not a recognized param-free norm")


class SPADE(nn.Module):
    """SPADE conditional normalization (normalization.py:66-110).

    `dtype` is the conv compute dtype (bf16 on TPU); the param-free norm and
    the final affine run in float32 for stable statistics.

    ``remat_mlp`` recomputes the gamma/beta branch from the seg during the
    backward pass instead of saving its three block-resolution activations
    per SPADE — a surgical traffic/memory trade (the GAN step is
    HBM-bandwidth-bound while the MXU has ~50% headroom; whole-block remat
    measured slower because it also recomputes the expensive main convs).
    """

    config_text: str  # e.g. 'spadesyncbatch3x3'
    norm_nc: int
    dtype: jnp.dtype = jnp.float32
    remat_mlp: bool = False
    fused_eval: bool = False  # Pallas norm+convs+affine kernel when not train

    def _gamma_beta(self, seg, ks: int):
        nhidden = 128
        actv = nn.relu(nn.Conv(nhidden, (ks, ks), padding="SAME",
                               dtype=self.dtype, name="mlp_shared")(seg))
        gamma = nn.Conv(self.norm_nc, (ks, ks), padding="SAME",
                        dtype=self.dtype, name="mlp_gamma")(actv)
        beta = nn.Conv(self.norm_nc, (ks, ks), padding="SAME",
                       dtype=self.dtype, name="mlp_beta")(actv)
        return gamma, beta

    @nn.compact
    def __call__(self, x, segmap, train: bool = True):
        parsed = re.search(r"spade(\D+)(\d)x\d", self.config_text)
        norm_kind, ks = str(parsed.group(1)), int(parsed.group(2))

        if (self.fused_eval and not train and ks == 3
                and not self.is_initializing()):
            from canonicalsg2im_tpu.ops.pallas_spade import (
                spade_fused_eval, spade_fused_supported)

            if spade_fused_supported(x.shape[1], x.shape[2], x.shape[3],
                                     norm_kind):
                # eval-mode batch stats make the norm elementwise, so the
                # whole SPADE chain runs as one Pallas kernel (no HBM
                # round-trips for actv/gamma/beta); ops/pallas_spade.py
                seg = resize_nearest(segmap, x.shape[1:3])
                p = self.variables["params"]
                st = self.variables["batch_stats"]["ParamFreeNorm_0"][
                    "BatchNorm_0"]
                return spade_fused_eval(
                    x, seg,
                    p["mlp_shared"]["kernel"], p["mlp_shared"]["bias"],
                    p["mlp_gamma"]["kernel"], p["mlp_gamma"]["bias"],
                    p["mlp_beta"]["kernel"], p["mlp_beta"]["bias"],
                    st["mean"], st["var"])

        # statistics always in float32; the normalized map and the affine ride
        # the compute dtype (bf16 on TPU — the saved-for-backward activations
        # of the resblock pyramid are the GAN step's largest HBM consumers)
        normalized = ParamFreeNorm(norm_kind)(
            x.astype(jnp.float32), train=train).astype(self.dtype)

        seg = resize_nearest(segmap, x.shape[1:3]).astype(self.dtype)
        fn = (nn.remat(SPADE._gamma_beta, static_argnums=(2,))
              if self.remat_mlp else SPADE._gamma_beta)
        gamma, beta = fn(self, seg, ks)
        return normalized * (1.0 + gamma) + beta


class SPADEResnetBlock(nn.Module):
    """architecture.py:21-68."""

    fin: int
    fout: int
    norm_G: str = "spectralspadesyncbatch3x3"
    dtype: jnp.dtype = jnp.float32
    remat_spade_mlp: bool = False
    fused_spade_eval: bool = False

    @nn.compact
    def __call__(self, x, seg, train: bool = True):
        use_sn = "spectral" in self.norm_G
        spade_cfg = self.norm_G.replace("spectral", "")
        fmiddle = min(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout

        def conv(feats, name, k=3, use_bias=True):
            layer = nn.Conv(feats, (k, k), padding="SAME", use_bias=use_bias,
                            dtype=self.dtype, name=name)
            return layer

        def apply_conv(layer, y):
            if use_sn:
                return nn.SpectralNorm(layer)(y, update_stats=train)
            return layer(y)

        def spade(name, nc, y):
            return SPADE(spade_cfg, nc, dtype=self.dtype,
                         remat_mlp=self.remat_spade_mlp,
                         fused_eval=self.fused_spade_eval, name=name)(
                y, seg, train=train)

        if learned_shortcut:
            x_s = apply_conv(conv(self.fout, "conv_s", k=1, use_bias=False),
                             spade("norm_s", self.fin, x))
        else:
            x_s = x

        dx = apply_conv(conv(fmiddle, "conv_0"),
                        _leaky(spade("norm_0", self.fin, x)))
        dx = apply_conv(conv(self.fout, "conv_1"),
                        _leaky(spade("norm_1", fmiddle, dx)))
        return (x_s + dx).astype(x.dtype)


def num_up_layers(num_upsampling_layers: str) -> int:
    table = {"normal": 5, "more": 6, "most": 7}
    if num_upsampling_layers not in table:
        raise ValueError(f"num_upsampling_layers [{num_upsampling_layers}]")
    return table[num_upsampling_layers]


def build_seg_layout(obj_vecs, objs, layout_boxes, layout_masks, image_size,
                     test_mode: bool, use_pallas: bool = False,
                     dtype=jnp.float32):
    """Object vectors -> spatial seg map, boxes or masks path
    (generator.py:81-96 / discriminator.py:100-119).

    ``use_pallas`` routes the boxes path through the sparse Pallas splat
    kernel (ops/pallas_splat.py) when the canvas tiles evenly; exact same
    numerics, work proportional to covered area instead of O x H x W.
    ``dtype`` is the seg compute/storage dtype (bf16 on TPU halves the HBM
    footprint of the largest single activation in the GAN step)."""
    real = (objs[..., 0] != 0).astype(obj_vecs.dtype)
    if layout_masks is not None:
        if use_pallas and not test_mode:
            from canonicalsg2im_tpu.ops.pallas_splat import (
                mask_splat_supported, masks_to_layout_pallas)

            B, O, D = obj_vecs.shape
            M = layout_masks.shape[-1]
            if mask_splat_supported(image_size[0], image_size[0], D, O, M):
                masked_vecs = obj_vecs * real[..., None]
                return masks_to_layout_pallas(
                    masked_vecs, layout_boxes, layout_masks,
                    image_size[0], image_size[0]).astype(dtype)
        return masks_to_layout(obj_vecs, layout_boxes, layout_masks,
                               image_size[0], image_size[0],
                               real_mask=real, test_mode=test_mode,
                               dtype=dtype)
    masked_vecs = obj_vecs * real[..., None]
    if use_pallas:
        from canonicalsg2im_tpu.ops.pallas_splat import (
            boxes_to_layout_pallas, splat_supported)

        if splat_supported(image_size[0], image_size[0]):
            return boxes_to_layout_pallas(masked_vecs, layout_boxes,
                                          image_size[0],
                                          image_size[0]).astype(dtype)
    return boxes_to_layout(masked_vecs, layout_boxes,
                           image_size[0], image_size[0], real_mask=real,
                           dtype=dtype)


class SPADEGenerator(nn.Module):
    """AttSPADE (generator.py:13-127): attribute-embedded layout -> SPADE
    ResNet upsampling pyramid -> RGB.

    The auxiliary ``repr_net``/``AppearanceEncoder`` the reference constructs
    but does not use in the main forward (generator.py:50-62) are available as
    standalone modules (`AppearanceEncoder`, `models/layers.MLP`) for the
    appearance-conditioned generation flows.
    """

    vocab: Dict
    embedding_dim: int = 32
    ngf: int = 64
    image_size: tuple = (256, 256)
    num_upsampling_layers: str = "normal"
    norm_G: str = "spectralspadesyncbatch3x3"
    aspect_ratio: float = 1.0
    use_vae: bool = False
    z_dim: int = 256
    dtype: jnp.dtype = jnp.float32   # conv compute dtype (bf16 on TPU)
    remat: bool = True               # rematerialize each SPADE resblock
    remat_spade_mlp: bool = False    # surgical gamma/beta-branch remat
    use_pallas_splat: bool = False
    # inference-only Pallas fusions (eval forwards; see ops/pallas_spade.py
    # and the measured train-path verdicts in docs/PERF.md)
    use_pallas_splat_eval: bool = False
    fused_spade_eval: bool = False

    @nn.compact
    def __call__(self, objs, layout_boxes, layout_masks=None, *,
                 test_mode: bool = False, train: bool = True, z=None):
        nf = self.ngf
        n_up = num_up_layers(self.num_upsampling_layers)
        sw = self.image_size[0] // (2 ** n_up)
        sh = round(sw / self.aspect_ratio)

        obj_vecs = AttributeEmbeddings(self.vocab["attributes"],
                                       self.embedding_dim,
                                       name="attribute_embedding")(objs)
        # training routes through the XLA splat by default (the Pallas
        # kernel's dense VJP loses on fwd+bwd); eval forwards take the
        # sparse kernel when enabled (1.74x fwd, scripts/bench_pallas_splat)
        use_pallas = (self.use_pallas_splat if train
                      else (self.use_pallas_splat or
                            self.use_pallas_splat_eval))
        seg = build_seg_layout(obj_vecs, objs, layout_boxes, layout_masks,
                               self.image_size, test_mode,
                               use_pallas=use_pallas,
                               dtype=self.dtype)

        # Pre-resize the seg once per pyramid resolution: the three SPADE
        # norms inside each resblock consume the same-size seg, so handing a
        # block its own-resolution seg replaces 3 full-res index-gathers per
        # block (each with a 256^2-seg scatter-add transpose in the backward;
        # measured ~6% of the GAN step, scripts/profile_gan_step.py) with one
        # shared slice per resolution. Exact: floor-convention nearest resize
        # (models/layers.resize_nearest) picks index i*2 at a x2 ratio, so a
        # chain of [:, ::2, ::2] halvings selects identical pixels to the
        # reference's direct F.interpolate(seg, (h, w), mode='nearest').
        seg_cache = {tuple(seg.shape[1:3]): seg}

        def seg_for(h, w):
            key = (h, w)
            if key in seg_cache:
                return seg_cache[key]
            src_key = (2 * h, 2 * w)
            if (src_key[0] <= seg.shape[1] and src_key[1] <= seg.shape[2]
                    and seg.shape[1] % src_key[0] == 0
                    and seg.shape[2] % src_key[1] == 0):
                out = seg_for(*src_key)[:, ::2, ::2]
            else:
                out = resize_nearest(seg, key)
            seg_cache[key] = out
            return out

        if self.use_vae:
            if z is None:
                z = jax.random.normal(self.make_rng("noise"),
                                      (objs.shape[0], self.z_dim))
            x = nn.Dense(16 * nf * sw * sh, name="fc")(z)
            x = x.reshape(objs.shape[0], sh, sw, 16 * nf).astype(self.dtype)
        else:
            # the pyramid carries the compute dtype; every norm re-derives
            # float32 statistics internally (ParamFreeNorm)
            x = seg_for(sh, sw)
            x = nn.Conv(16 * nf, (3, 3), padding="SAME", dtype=self.dtype,
                        name="fc")(x)

        # jax.checkpoint each resblock: trade recompute for HBM — the
        # backward pass otherwise keeps every conv activation of the
        # 7-block pyramid live at up to 256^2 resolution
        block_cls = (nn.remat(SPADEResnetBlock, static_argnums=(3,))
                     if self.remat else SPADEResnetBlock)
        blk = lambda fi, fo, name: block_cls(
            fi, fo, self.norm_G, dtype=self.dtype,
            remat_spade_mlp=self.remat_spade_mlp,
            fused_spade_eval=self.fused_spade_eval and not train,
            name=name)
        def run(b, x):
            # the block's norms all operate at x's resolution
            return b(x, seg_for(x.shape[1], x.shape[2]), train)

        x = run(blk(16 * nf, 16 * nf, "head_0"), x)
        x = upsample_nearest(x)
        x = run(blk(16 * nf, 16 * nf, "G_middle_0"), x)
        if self.num_upsampling_layers in ("more", "most"):
            x = upsample_nearest(x)
        x = run(blk(16 * nf, 16 * nf, "G_middle_1"), x)
        x = upsample_nearest(x)
        x = run(blk(16 * nf, 8 * nf, "up_0"), x)
        x = upsample_nearest(x)
        x = run(blk(8 * nf, 4 * nf, "up_1"), x)
        x = upsample_nearest(x)
        x = run(blk(4 * nf, 2 * nf, "up_2"), x)
        x = upsample_nearest(x)
        x = run(blk(2 * nf, 1 * nf, "up_3"), x)
        if self.num_upsampling_layers == "most":
            x = upsample_nearest(x)
            x = run(blk(nf, nf // 2, "up_4"), x)

        x = nn.Conv(3, (3, 3), padding="SAME", name="conv_img")(_leaky(x))
        return jnp.tanh(x)


class AppearanceEncoder(nn.Module):
    """CNN crop encoder (generator.py:130-147)."""

    arch: str = "C4-64-2,C4-128-2,C4-256-2"
    normalization: str = "batch"
    activation: str = "leakyrelu-0.2"
    padding: str = "valid"
    vecs_size: int = 192

    @nn.compact
    def __call__(self, crops, train: bool = True):
        x = CNN(self.arch, normalization=self.normalization,
                activation=self.activation, padding=self.padding)(crops,
                                                                  train=train)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.vecs_size)(x)


class ConvEncoder(nn.Module):
    """VAE image encoder (encoder.py:13-55): 5-6 strided convs -> (mu, logvar)."""

    ngf: int = 64
    norm_E: str = "spectralinstance"
    image_size: tuple = (256, 256)
    z_dim: int = 256

    @nn.compact
    def __call__(self, x, train: bool = True):
        use_sn = self.norm_E.startswith("spectral")
        kind = self.norm_E[len("spectral"):] if use_sn else self.norm_E

        def block(y, feats, name):
            layer = nn.Conv(feats, (3, 3), strides=(2, 2), padding="SAME",
                            use_bias=(kind in ("none", "")), name=name)
            y = nn.SpectralNorm(layer)(y, update_stats=train) if use_sn else layer(y)
            if kind == "instance":
                mean = y.mean(axis=(1, 2), keepdims=True)
                var = y.var(axis=(1, 2), keepdims=True)
                y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
            elif kind in ("batch", "sync_batch"):
                y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5)(y)
            return y

        if x.shape[1] != 256 or x.shape[2] != 256:
            x = jax.image.resize(x, (x.shape[0], 256, 256, x.shape[3]),
                                 method="bilinear")
        ndf = self.ngf
        x = block(x, ndf, "layer1")
        x = block(_leaky(x), ndf * 2, "layer2")
        x = block(_leaky(x), ndf * 4, "layer3")
        x = block(_leaky(x), ndf * 8, "layer4")
        x = block(_leaky(x), ndf * 8, "layer5")
        if self.image_size[0] >= 256:
            x = block(_leaky(x), ndf * 8, "layer6")
        x = _leaky(x)
        x = x.reshape(x.shape[0], -1)
        mu = nn.Dense(self.z_dim, name="fc_mu")(x)
        logvar = nn.Dense(self.z_dim, name="fc_var")(x)
        return mu, logvar
