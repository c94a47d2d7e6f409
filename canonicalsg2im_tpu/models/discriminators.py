"""Discriminators (reference `spade/models/networks/discriminator.py`).

- ``MultiscaleDiscriminator``: builds the layout seg exactly like the
  generator, concatenates [img, seg], and runs num_D PatchGAN discriminators
  at x1 / x0.5 scales, returning intermediate features for feature matching.
- ``AcCropDiscriminator``: bilinear-crops every object box and scores
  real/fake plus an auxiliary object-classification loss. Fixed-shape: all
  (B, O) slots are cropped; dummies are masked out of both heads.
- ``MultiscaleMaskDiscriminator2``: per-object one-hot class map ⊗ M x M grid
  concatenated with the (predicted) mask -> multiscale PatchGAN.

The reference's ``VectorPool`` / ``get_fake_pool`` "fool" machinery is
vestigial — ``MultiscaleDiscriminator.forward`` accepts ``fool`` but never
uses it (discriminator.py:97-131), so the D_img_wrong term is computed on the
same inputs as D_img_real; we reproduce that effective behavior in the loss
orchestrator and keep ``VectorPool`` as a host-side utility for parity.
"""
from __future__ import annotations

import random
from typing import Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from canonicalsg2im_tpu.models.embed import AttributeEmbeddings
from canonicalsg2im_tpu.models.layers import CNN, avg_pool_3x3_s2
from canonicalsg2im_tpu.models.spade import build_seg_layout, _leaky
from canonicalsg2im_tpu.ops.bilinear import crop_bbox_batch


# PatchGAN conv geometry (discriminator.py:168-170): k4 with torch
# padw = ceil(3/2) = 2 — shared by the concat and per-part first-conv paths
# so the two 'conv0' implementations can never diverge
_PATCHGAN_K = (4, 4)
_PATCHGAN_PAD = ((2, 2), (2, 2))


class _SplitFirstConv(nn.Module):
    """First PatchGAN conv applied per input part and summed.

    Convolution is linear in input channels, so
    ``conv(concat(parts)) == sum_i conv(part_i, kernel[:, :, slice_i])``
    exactly — splitting avoids ever materializing the concatenated
    ``[img(3), seg(semantic_nc)]`` tensor whose odd channel count (131 at
    the defaults) forces XLA layout-convert copies and a lane-misaligned
    input-gradient conv on TPU (measured ~8% of the GAN step as "data
    formatting", scripts/profile_gan_step.py). The param tree
    ({kernel, bias}, named and shaped like ``nn.Conv``) is unchanged, so
    existing checkpoints and the reference importer are unaffected."""

    features: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, parts):
        in_ch = sum(p.shape[-1] for p in parts)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            _PATCHGAN_K + (in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        y = None
        off = 0
        for p in parts:
            c = p.shape[-1]
            k = kernel[:, :, off:off + c, :].astype(self.dtype)
            r = jax.lax.conv_general_dilated(
                p.astype(self.dtype), k, (self.stride, self.stride),
                _PATCHGAN_PAD,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = r if y is None else y + r
            off += c
        return y + bias.astype(self.dtype)


class NLayerDiscriminator(nn.Module):
    """PatchGAN (discriminator.py:164-206): k4 convs, stride 2 except the
    last body layer, channel doubling capped at 512, per-layer outputs.

    ``x`` may be a single (B, H, W, C) tensor or a tuple of tensors whose
    channels would be concatenated — the tuple form feeds the first conv
    per-part (exactly equivalent, see ``_SplitFirstConv``)."""

    ndf: int = 64
    n_layers: int = 4
    norm_D: str = "spectralinstance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True) -> List[jnp.ndarray]:
        use_sn = self.norm_D.startswith("spectral")
        kind = self.norm_D[len("spectral"):] if use_sn else self.norm_D

        def conv(y, feats, stride, name, use_bias, sn):
            # the reference wraps ONLY the middle convs in the norm-layer
            # factory (discriminator.py:175-185): the first conv and the
            # final 1-channel head are bare Conv2d, no spectral norm
            layer = nn.Conv(feats, _PATCHGAN_K, strides=(stride, stride),
                            padding=_PATCHGAN_PAD, use_bias=use_bias,
                            dtype=self.dtype, name=name)
            return (nn.SpectralNorm(layer)(y, update_stats=train)
                    if (use_sn and sn) else layer(y))

        def norm(y):
            if kind == "instance":
                mean = y.mean(axis=(1, 2), keepdims=True)
                var = y.var(axis=(1, 2), keepdims=True)
                return (y - mean) * jax.lax.rsqrt(var + 1e-5)
            if kind in ("batch", "sync_batch"):
                return nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5)(y)
            return y

        results = []
        nf = self.ndf
        if isinstance(x, (tuple, list)):
            x = _leaky(_SplitFirstConv(nf, 2, dtype=self.dtype,
                                       name="conv0")(tuple(x)))
        else:
            x = _leaky(conv(x, nf, 2, "conv0", use_bias=True, sn=False))
        results.append(x)
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            stride = 1 if n == self.n_layers - 1 else 2
            # bias removed when a norm follows (normalization.py:33-37)
            x = conv(x, nf, stride, f"conv{n}",
                     use_bias=(kind in ("none", "")), sn=True)
            x = _leaky(norm(x))
            results.append(x)
        x = conv(x, 1, 1, "conv_out", use_bias=True, sn=False)
        results.append(x)
        return results


class MultiscaleDiscriminator(nn.Module):
    """discriminator.py:66-131.

    The layout ``seg`` depends only on (objs, boxes, masks) and the D's own
    embedding params — NOT on the scored image — so one training step's four
    image-D forwards (fake/real x G-loss/D-loss) share a single seg. Callers
    build it once via ``apply(..., method=MultiscaleDiscriminator.seg_layout)``
    and pass it through ``seg=``; with ``seg=None`` the forward is
    self-contained, matching the reference call shape."""

    vocab: Dict
    embedding_dim: int = 32
    image_size: tuple = (256, 256)
    num_D: int = 2
    n_layers_D: int = 4
    ndf: int = 64
    norm_D: str = "spectralinstance"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.attribute_embedding = AttributeEmbeddings(
            self.vocab["attributes"], self.embedding_dim,
            use_attr_fc_gen=True)
        self.discriminators = [
            NLayerDiscriminator(self.ndf, self.n_layers_D, self.norm_D,
                                dtype=self.dtype, name=f"discriminator_{i}")
            for i in range(self.num_D)]

    def seg_layout(self, objs, layout_boxes, layout_masks=None):
        """(objs, boxes[, masks]) -> (B, H, W, semantic_nc) layout seg, using
        this discriminator's own attribute embedding (discriminator.py:100-119)."""
        obj_vecs = self.attribute_embedding(objs)
        return build_seg_layout(obj_vecs, objs, layout_boxes, layout_masks,
                                self.image_size, test_mode=False,
                                dtype=self.dtype)

    def __call__(self, img, objs, layout_boxes, layout_masks=None, *,
                 seg=None, train: bool = True) -> List[List[jnp.ndarray]]:
        if seg is None:
            seg = self.seg_layout(objs, layout_boxes, layout_masks)
        # img and seg ride as separate parts: pooling is per-channel, so
        # pooling the parts equals pooling the concat, and the first conv of
        # each scale consumes them per-part (_SplitFirstConv) — the odd
        # 3+semantic_nc concat never materializes
        x = (img.astype(self.dtype), seg.astype(self.dtype))
        results = []
        for i in range(self.num_D):
            results.append(self.discriminators[i](x, train=train))
            if i + 1 < self.num_D:
                x = tuple(avg_pool_3x3_s2(p) for p in x)
        return results


class AcDiscriminator(nn.Module):
    """CNN real/fake + aux-classification heads (discriminator.py:209-237)."""

    vocab: Dict
    arch: str = "C4-64-2,C4-128-2,C4-256-2"
    normalization: str = "batch"
    activation: str = "leakyrelu-0.2"
    padding: str = "valid"

    @nn.compact
    def __call__(self, crops, labels, label_mask, train: bool = True):
        x = CNN(self.arch, normalization=self.normalization,
                activation=self.activation, padding=self.padding)(crops,
                                                                  train=train)
        vecs = nn.Dense(1024)(x.mean(axis=(1, 2)))
        real_scores = nn.Dense(1, name="real_classifier")(vecs)
        num_objects = max(self.vocab["object_name_to_idx"].values()) + 1
        obj_scores = nn.Dense(num_objects, name="obj_classifier")(vecs)
        logp = jax.nn.log_softmax(obj_scores)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        m = label_mask.astype(nll.dtype)
        ac_loss = (nll * m).sum() / jnp.maximum(m.sum(), 1.0)
        return real_scores, ac_loss


class AcCropDiscriminator(nn.Module):
    """discriminator.py:240-261, fixed-shape."""

    vocab: Dict
    arch: str = "C4-64-2,C4-128-2,C4-256-2"
    normalization: str = "batch"
    activation: str = "leakyrelu-0.2"
    padding: str = "valid"
    object_size: int = 32

    @nn.compact
    def __call__(self, imgs, objs, boxes, train: bool = True):
        crops, real = crop_bbox_batch(imgs, objs, boxes, self.object_size)
        B, O = real.shape
        crops = crops.reshape(B * O, self.object_size, self.object_size, -1)
        labels = objs[..., 0].reshape(B * O)
        scores, ac_loss = AcDiscriminator(
            self.vocab, self.arch, self.normalization, self.activation,
            self.padding, name="discriminator")(
            crops, labels, real.reshape(B * O), train=train)
        # mask dummy slots out of the real/fake head as well
        scores = scores.reshape(B, O)
        return scores, real, ac_loss, crops


class NLayerMaskDiscriminator(nn.Module):
    """discriminator.py:312-356 — same PatchGAN body over mask stacks.
    Reads the image-D hyperparams (ndf/n_layers_D/norm_D), as the reference
    does (its *_mask flags are declared but unused)."""

    ndf: int = 64
    n_layers: int = 4
    norm_D: str = "spectralinstance"

    @nn.compact
    def __call__(self, x, train: bool = True):
        return NLayerDiscriminator(self.ndf, self.n_layers, self.norm_D,
                                   name="body")(x, train=train)


class MultiscaleMaskDiscriminator(nn.Module):
    """discriminator.py:264-308."""

    vocab: Dict
    num_D: int = 2
    n_layers_D: int = 4
    ndf: int = 64
    norm_D: str = "spectralinstance"

    @nn.compact
    def __call__(self, objs, layout_masks, *, train: bool = True):
        """Returns (multiscale feature lists over the flattened (B*O) slot
        axis, real-slot mask (B*O,)). The reference drops dummy slots
        dynamically (discriminator.py:280-297); at fixed shape they ride
        through as zeroed inputs and the loss masks them out."""
        B, O, M, _ = layout_masks.shape
        num_objects = max(self.vocab["object_name_to_idx"].values()) + 1
        labels = objs[..., 0]
        real = (labels != 0).astype(layout_masks.dtype)
        one_hot = jax.nn.one_hot(labels, num_objects, dtype=layout_masks.dtype)
        one_hot = one_hot * real[..., None]
        cond = jnp.broadcast_to(one_hot[:, :, None, None, :],
                                (B, O, M, M, num_objects))
        masks = (layout_masks * real[:, :, None, None])[..., None]
        x = jnp.concatenate([cond, masks], axis=-1).reshape(B * O, M, M, -1)
        results = []
        for i in range(self.num_D):
            results.append(NLayerMaskDiscriminator(
                self.ndf, self.n_layers_D, self.norm_D,
                name=f"discriminator_{i}")(x, train=train))
            if i + 1 < self.num_D:
                x = avg_pool_3x3_s2(x)
        return results, real.reshape(B * O)


class VectorPool:
    """Host-side historical-vector pool (discriminator.py:15-43). Kept for
    capability parity with the reference's fool-pool experiments; not used in
    the main training path (nor is it there)."""

    def __init__(self, pool_size: int):
        self.pool_size = pool_size
        self.vectors: dict = {}

    def query(self, objs, vectors):
        if self.pool_size == 0:
            return vectors
        out = []
        for obj, vec in zip(np.asarray(objs).tolist(), list(vectors)):
            pool = self.vectors.setdefault(obj, [])
            if not pool:
                pool.append(vec)
                out.append(vec)
            elif len(pool) < self.pool_size:
                idx = random.randint(0, len(pool) - 1)
                pool.append(vec)
                out.append(pool[idx])
            else:
                idx = random.randint(0, len(pool) - 1)
                out.append(pool[idx])
                pool[idx] = vec
        return np.stack(out)
