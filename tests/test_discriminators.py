"""Discriminator geometry / masking tests (torch used as geometry oracle)."""
import jax
import numpy as np
import pytest

from canonicalsg2im_tpu.data.vocab import build_clevr_vocab
from canonicalsg2im_tpu.models.discriminators import (
    AcCropDiscriminator,
    MultiscaleDiscriminator,
    MultiscaleMaskDiscriminator,
    NLayerDiscriminator,
    VectorPool,
)


def test_patchgan_geometry_matches_torch():
    """k4 convs with torch padding ceil(3/2)=2, stride 2/2/2/1 + output conv:
    256 -> 129 -> 65 -> 33 -> 34 -> 35 (discriminator.py:170-191)."""
    import torch
    import torch.nn as tnn

    x = np.zeros((1, 256, 256, 3), np.float32)
    d = NLayerDiscriminator(ndf=8, n_layers=4, norm_D="instance")
    v = d.init(jax.random.PRNGKey(0), x, train=False)
    feats = d.apply(v, x, train=False)

    tx = torch.zeros(1, 3, 256, 256)
    torch_shapes = []
    for c in [tnn.Conv2d(3, 8, 4, 2, 2), tnn.Conv2d(8, 16, 4, 2, 2),
              tnn.Conv2d(16, 32, 4, 2, 2), tnn.Conv2d(32, 64, 4, 1, 2),
              tnn.Conv2d(64, 1, 4, 1, 2)]:
        tx = c(tx)
        torch_shapes.append(tuple(tx.shape[2:]))
    assert [f.shape[1:3] for f in feats] == torch_shapes


def test_multiscale_returns_num_d_feature_lists():
    vocab = build_clevr_vocab()
    rng = np.random.default_rng(0)
    B, O = 2, 4
    img = rng.normal(size=(B, 32, 32, 3)).astype(np.float32)
    objs = np.ones((B, O, 4), np.int32)
    boxes = np.concatenate([rng.uniform(0, .5, (B, O, 2)),
                            rng.uniform(.1, .3, (B, O, 2))], -1).astype(np.float32)
    d = MultiscaleDiscriminator(vocab=vocab, embedding_dim=4,
                                image_size=(32, 32), num_D=2, n_layers_D=2,
                                ndf=8)
    v = d.init(jax.random.PRNGKey(0), img, objs, boxes, train=False)
    out = d.apply(v, img, objs, boxes, train=False)
    assert len(out) == 2
    assert len(out[0]) == 3  # n_layers feats + final score
    # second scale is downsampled
    assert out[1][0].shape[1] < out[0][0].shape[1]


def test_ac_crop_discriminator_masks_dummies():
    vocab = build_clevr_vocab()
    rng = np.random.default_rng(1)
    B, O = 2, 3
    img = rng.normal(size=(B, 64, 64, 3)).astype(np.float32)
    objs = np.ones((B, O, 4), np.int32)
    objs[0, 2] = 0  # dummy
    boxes = np.concatenate([rng.uniform(0, .4, (B, O, 2)),
                            rng.uniform(.2, .4, (B, O, 2))], -1).astype(np.float32)
    d = AcCropDiscriminator(vocab=vocab, object_size=32)
    v = d.init(jax.random.PRNGKey(0), img, objs, boxes, train=False)
    scores, real, ac_loss, crops = d.apply(v, img, objs, boxes, train=False)
    assert scores.shape == (B, O)
    assert bool(real[0, 2]) is False
    assert np.isfinite(float(ac_loss))


def test_mask_discriminator_slot_mask():
    vocab = build_clevr_vocab()
    rng = np.random.default_rng(2)
    B, O, M = 2, 3, 16
    objs = np.ones((B, O, 4), np.int32)
    objs[1, 0] = 0
    masks = (rng.uniform(size=(B, O, M, M)) > .5).astype(np.float32)
    d = MultiscaleMaskDiscriminator(vocab=vocab, num_D=2, n_layers_D=2, ndf=8)
    v = d.init(jax.random.PRNGKey(0), objs, masks, train=False)
    out, slot_real = d.apply(v, objs, masks, train=False)
    assert slot_real.shape == (B * O,)
    assert float(slot_real.sum()) == 5.0


def test_vector_pool():
    pool = VectorPool(2)
    v1 = pool.query([1, 1], np.array([[1.0], [2.0]]))
    assert v1.shape == (2, 1)
    assert VectorPool(0).query([1], np.array([[5.0]]))[0, 0] == 5.0


def test_split_first_conv_matches_concat():
    """The tuple input form (per-part first conv, no odd-channel concat on
    device) is exactly the concat form: conv is linear in input channels and
    the param tree ({kernel,bias} under conv0) is shared between the paths."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    img = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    seg = rng.standard_normal((2, 64, 64, 13)).astype(np.float32)
    d = NLayerDiscriminator(ndf=8, n_layers=3, norm_D="instance")
    v = d.init(jax.random.PRNGKey(0), (img, seg), train=False)
    split = d.apply(v, (img, seg), train=False)
    concat = d.apply(v, jnp.concatenate([img, seg], axis=-1), train=False)
    assert len(split) == len(concat)
    for s, c in zip(split, concat):
        np.testing.assert_allclose(np.asarray(s), np.asarray(c),
                                   rtol=2e-5, atol=2e-5)
