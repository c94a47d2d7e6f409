"""Pallas splat kernel vs. the XLA einsum path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canonicalsg2im_tpu.ops.layout import boxes_to_layout
from canonicalsg2im_tpu.ops.pallas_splat import (
    boxes_to_layout_pallas,
    splat_supported,
)


def _rand(rng, B, O, D):
    vecs = rng.normal(size=(B, O, D)).astype(np.float32)
    xy = rng.uniform(0, 0.6, (B, O, 2)).astype(np.float32)
    wh = rng.uniform(0.05, 0.35, (B, O, 2)).astype(np.float32)
    boxes = np.concatenate([xy, wh], axis=-1)
    return vecs, boxes


@pytest.mark.parametrize("seed", range(2))
def test_pallas_matches_einsum(seed):
    rng = np.random.default_rng(seed)
    B, O, D, H, W = 2, 6, 8, 128, 128
    assert splat_supported(H, W)
    vecs, boxes = _rand(rng, B, O, D)
    # include a padding box
    boxes[0, -1] = -1.0
    want = np.asarray(boxes_to_layout(vecs, boxes, H, W))
    got = np.asarray(boxes_to_layout_pallas(vecs, boxes, H, W, True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pallas_custom_vjp_matches_einsum_grads():
    rng = np.random.default_rng(3)
    B, O, D, H, W = 1, 4, 4, 128, 128
    vecs, boxes = _rand(rng, B, O, D)
    g = rng.normal(size=(B, H, W, D)).astype(np.float32)

    def loss_ref(v, b):
        return jnp.sum(boxes_to_layout(v, b, H, W) * g)

    def loss_pal(v, b):
        return jnp.sum(boxes_to_layout_pallas(v, b, H, W, True) * g)

    gv_ref, gb_ref = jax.grad(loss_ref, argnums=(0, 1))(vecs, boxes)
    gv_pal, gb_pal = jax.grad(loss_pal, argnums=(0, 1))(vecs, boxes)
    np.testing.assert_allclose(np.asarray(gv_pal), np.asarray(gv_ref),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gb_pal), np.asarray(gb_ref),
                               atol=1e-2, rtol=1e-2)


@pytest.mark.parametrize("seed", range(2))
def test_pallas_nhwc_variant_matches_einsum(seed):
    """D % 128 == 0 routes through the NHWC-direct kernel (no feature-major
    output, no host transpose) — same numerics as the dense einsums."""
    rng = np.random.default_rng(10 + seed)
    B, O, D, H, W = 2, 12, 128, 256, 128
    vecs, boxes = _rand(rng, B, O, D)
    boxes[1, -1] = -1.0  # padding box
    boxes[0, 0, 2] = 0.0  # zero-width box vanishes
    want = np.asarray(boxes_to_layout(vecs, boxes, H, W))
    got = np.asarray(boxes_to_layout_pallas(vecs, boxes, H, W, True))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("seed", range(2))
def test_pallas_mask_splat_matches_einsum(seed):
    from canonicalsg2im_tpu.ops.layout import masks_to_layout
    from canonicalsg2im_tpu.ops.pallas_splat import (
        mask_splat_supported, masks_to_layout_pallas)

    rng = np.random.default_rng(20 + seed)
    B, O, D, H, W, M = 2, 8, 128, 128, 128, 16
    assert mask_splat_supported(H, W, D, O, M)
    vecs, boxes = _rand(rng, B, O, D)
    boxes[0, -1] = -1.0   # padding box
    boxes[1, 0, 3] = 0.0  # zero-height box vanishes
    masks = rng.uniform(0, 1, (B, O, M, M)).astype(np.float32)
    want = np.asarray(masks_to_layout(vecs, boxes, masks, H, W))
    got = np.asarray(masks_to_layout_pallas(vecs, boxes, masks, H, W, True))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pallas_mask_splat_grads_match_dense():
    from canonicalsg2im_tpu.ops.layout import masks_to_layout
    from canonicalsg2im_tpu.ops.pallas_splat import masks_to_layout_pallas

    rng = np.random.default_rng(30)
    B, O, D, H, W, M = 1, 4, 128, 128, 128, 8
    vecs, boxes = _rand(rng, B, O, D)
    masks = rng.uniform(0, 1, (B, O, M, M)).astype(np.float32)
    g = rng.normal(size=(B, H, W, D)).astype(np.float32)

    def loss_ref(v, b, m):
        return jnp.sum(masks_to_layout(v, b, m, H, W) * g)

    def loss_pal(v, b, m):
        return jnp.sum(masks_to_layout_pallas(v, b, m, H, W, True) * g)

    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(vecs, boxes, masks)
    pal = jax.grad(loss_pal, argnums=(0, 1, 2))(vecs, boxes, masks)
    for r, p in zip(ref, pal):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)
