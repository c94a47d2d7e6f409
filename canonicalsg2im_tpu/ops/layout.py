"""Differentiable layout splatting — TPU-native closed forms.

The reference renders per-object layouts by expanding each object vector to an
8x8 tile and pushing it through ``F.grid_sample`` with an inverse-affine grid
(`sg2im/layout.py:12-112`). Because that tile is *constant* per channel,
bilinear sampling with zero padding reduces analytically to a separable
"coverage" profile per axis: a trapezoid that is 1 inside the box and ramps
linearly to 0 over one source-pixel width at the borders. The splat therefore
becomes two small einsums (pure MXU work) — no gather, no scatter, no kernel —
and is exactly equal (to float round-off) to the reference's
grid_sample(align_corners=True, padding_mode='zeros') semantics, which is what
PyTorch <= 1.2 (the reference's pin) used.

For mask layouts the M x M mask is genuinely sampled, but the sampling grid is
separable in (h, w), so bilinear interpolation factorizes into two dense
(2-banded) interpolation matrices — again matmuls.

All functions are batched (leading B dim), fixed-shape, and mask dummy /
padding objects by construction (their coverage is identically zero), which
replaces the reference's dynamic `remove_dummy_objects` filtering
(`sg2im/utils.py:56-63`) without any data-dependent shapes.

Layouts are returned NHWC.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

TILE = 8  # the reference's constant source-tile size (sg2im/layout.py:34)


def _axis_pixel_coords(starts, sizes, out_size: int, src_size: int):
    """Source-pixel coordinates for each output position along one axis.

    The reference maps output position u in [0,1] to normalized coordinate
    2*(u - x0)/w - 1 and grid_sample(align_corners=True) maps that to pixel
    coordinate (g+1)/2 * (src-1)  =>  (u - x0)/w * (src-1).
    """
    u = jnp.linspace(0.0, 1.0, out_size, dtype=jnp.float32)
    safe = jnp.where(sizes == 0, 1.0, sizes)
    frac = (u - starts[..., None]) / safe[..., None]
    frac = jnp.where(sizes[..., None] == 0, -1.0, frac)  # zero-size boxes vanish
    return frac * (src_size - 1)


def _coverage_from_pixels(x_pix, src_size: int):
    """Bilinear zero-padded sampling weight of a constant-1 source row.

    1 on [0, src-1], ramping linearly to 0 over one pixel outside.
    """
    return jnp.clip(jnp.minimum(x_pix + 1.0, src_size - x_pix), 0.0, 1.0)


def box_coverage(boxes, H: int, W: int, src_size: int = TILE):
    """Per-object separable coverage profiles.

    Args:
      boxes: (..., O, 4) [x0, y0, w, h] in [0, 1]. Padding boxes (-1s) and the
        __image__ dummy box get zero coverage automatically.
    Returns:
      (cov_y (..., O, H), cov_x (..., O, W)) float32.
    """
    x_pix = _axis_pixel_coords(boxes[..., 0], boxes[..., 2], W, src_size)
    y_pix = _axis_pixel_coords(boxes[..., 1], boxes[..., 3], H, src_size)
    return _coverage_from_pixels(y_pix, src_size), _coverage_from_pixels(x_pix, src_size)


def boxes_to_layout(vecs, boxes, H: int, W: int | None = None, *,
                    real_mask=None, obj_chunk: int = 64, dtype=None):
    """Splat object vectors into a spatial layout (reference boxes_to_layout,
    sg2im/layout.py:12-45, pooling='sum').

    Args:
      vecs: (B, O, D) object vectors. Rows for dummy/padding objects should be
        zeroed by the caller OR carry boxes with zero coverage (both hold in
        this framework).
      boxes: (B, O, 4) xywh in [0, 1].
      dtype: output dtype (bf16 on TPU halves the layout's HBM footprint —
        it is the GAN step's largest single activation). The einsums
        themselves stay float32: XLA:TPU fuses the final cast for free, and
        XLA:CPU cannot execute bf16 x bf16 dots at all.
    Returns:
      (B, H, W, D) layout, sum-pooled over objects.
    """
    if W is None:
        W = H
    B, O, D = vecs.shape
    cov_y, cov_x = box_coverage(boxes, H, W)
    if real_mask is not None:
        # drop dummy/padding objects regardless of their (possibly predicted)
        # boxes — the static-shape analogue of remove_dummy_objects
        cov_y = cov_y * real_mask[..., None]
    vecs = vecs.astype(jnp.float32)
    out_dtype = jnp.float32 if dtype is None else jnp.dtype(dtype)

    chunk = min(obj_chunk, O)
    if O % chunk:
        pad = chunk - O % chunk
        vecs = jnp.pad(vecs, ((0, 0), (0, pad), (0, 0)))
        cov_y = jnp.pad(cov_y, ((0, 0), (0, pad), (0, 0)))
        cov_x = jnp.pad(cov_x, ((0, 0), (0, pad), (0, 0)))
        O += pad
    n_chunks = O // chunk

    def body(acc, args):
        v, cy, cx = args  # (B, chunk, D), (B, chunk, H), (B, chunk, W)
        vx = jnp.einsum("bod,bow->bowd", v, cx)          # (B, chunk, W, D)
        acc = acc + jnp.einsum("boh,bowd->bhwd", cy, vx,
                               preferred_element_type=jnp.float32)
        return acc, None

    split = lambda a: a.reshape(B, n_chunks, chunk, *a.shape[2:]).swapaxes(0, 1)
    init = jnp.zeros((B, H, W, D), dtype=jnp.float32)
    out, _ = jax.lax.scan(body, init, (split(vecs), split(cov_y), split(cov_x)))
    return out.astype(out_dtype)


def _interp_matrix(x_pix, src_size: int):
    """(..., out, src) bilinear interpolation matrix with zero padding.

    Row r holds the two tap weights for output position r; taps falling
    outside [0, src-1] are dropped (zero padding), matching grid_sample.
    """
    ix0 = jnp.floor(x_pix)
    w1 = x_pix - ix0
    w0 = 1.0 - w1
    m = jnp.arange(src_size, dtype=jnp.float32)
    t0 = (m == ix0[..., None]) * w0[..., None]
    t1 = (m == (ix0[..., None] + 1)) * w1[..., None]
    return t0 + t1


def sample_masks(masks, boxes, H: int, W: int):
    """Bilinear-resample each object's M x M mask onto the H x W canvas through
    its box (the grid_sample call of masks_to_layout, sg2im/layout.py:70).

    Args:
      masks: (B, O, M, M)
      boxes: (B, O, 4) xywh.
    Returns:
      (B, O, H, W) sampled masks (zero outside the box).
    """
    M = masks.shape[-1]
    x_pix = _axis_pixel_coords(boxes[..., 0].reshape(-1), boxes[..., 2].reshape(-1), W, M)
    y_pix = _axis_pixel_coords(boxes[..., 1].reshape(-1), boxes[..., 3].reshape(-1), H, M)
    wx = _interp_matrix(x_pix, M)                      # (BO, W, M)
    wy = _interp_matrix(y_pix, M)                      # (BO, H, M)
    flat = masks.reshape(-1, M, M)
    rows = jnp.einsum("nhm,nmk->nhk", wy, flat)        # (BO, H, M)
    out = jnp.einsum("nhk,nwk->nhw", rows, wx)         # (BO, H, W)
    return out.reshape(masks.shape[0], masks.shape[1], H, W)


def masks_to_layout(vecs, boxes, masks, H: int, W: int | None = None, *,
                    real_mask=None, test_mode: bool = False, dtype=None):
    """Mask-shaped splat (reference masks_to_layout, sg2im/layout.py:48-77).

    Training mode sum-pools ``vec ⊗ sampled_mask`` over objects. Test mode
    reproduces the reference's occlusion compositing
    (`_pool_mask_samples`, layout.py:115-153): objects are ranked by total
    splat mass ascending and each pixel belongs to the lowest-ranked object
    whose *clean* sampled mask exceeds 0.5 there — expressed as an argmin over
    ranks instead of the reference's Python sort-and-loop.

    Returns (B, H, W, D).
    """
    if W is None:
        W = H
    out_dtype = jnp.float32 if dtype is None else jnp.dtype(dtype)
    sampled = sample_masks(masks.astype(jnp.float32), boxes, H, W)  # (B,O,H,W)
    if real_mask is not None:
        sampled = sampled * real_mask[:, :, None, None]
    if not test_mode:
        return jnp.einsum("bohw,bod->bhwd", sampled,
                          vecs.astype(jnp.float32),
                          preferred_element_type=jnp.float32).astype(out_dtype)

    # total mass of each object's splat: sum_d vec[o,d] * sum_hw mask
    mass = jnp.sum(vecs, axis=-1) * jnp.sum(sampled, axis=(-2, -1))  # (B, O)
    order = jnp.argsort(mass, axis=-1)                      # ascending, like np.argsort
    ranks = jnp.argsort(order, axis=-1).astype(jnp.float32)  # rank of each object
    indicator = sampled > 0.5                                # (B, O, H, W)
    priority = jnp.where(indicator, ranks[:, :, None, None], jnp.inf)
    winner = jnp.argmin(priority, axis=1)                    # (B, H, W)
    any_hit = jnp.any(indicator, axis=1)                     # (B, H, W)
    one_hot = jax.nn.one_hot(winner, sampled.shape[1], axis=1) * any_hit[:, None]
    chosen = sampled * one_hot                               # (B, O, H, W)
    return jnp.einsum("bohw,bod->bhwd", chosen, vecs.astype(jnp.float32),
                      preferred_element_type=jnp.float32).astype(out_dtype)
