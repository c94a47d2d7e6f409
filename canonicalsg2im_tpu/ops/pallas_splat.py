"""Pallas TPU kernel: sparse box-layout splatting.

The closed-form XLA path (ops/layout.py) costs O(B·O·H·W·D) MXU flops even
though each object's coverage is nonzero only inside its box (typically a few
percent of the canvas). This kernel tiles the canvas on a (B, H/TH, W/TW)
grid, prefetches per-object box bounds as scalars, and for each tile loops
over objects *skipping* — via `@pl.when` on scalar overlap tests — every
object whose coverage support misses the tile. Effective work drops to
O(B · Σ_o area_o · D).

Forward-only kernel with a `jax.custom_vjp`: the backward pass reuses the
dense einsum math (exact gradients; see `_splat_bwd`). Numerics match
ops.layout.boxes_to_layout exactly (same trapezoid coverage = the reference's
grid_sample(align_corners=True) semantics, sg2im/layout.py:12-45).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from canonicalsg2im_tpu.ops.layout import TILE, box_coverage

TH = 128  # tile height (128-aligned so lane-dim slices are provably aligned)
TW = 128  # tile width (lane width)
TD = 64   # max feature width per pallas_call (bounds the VMEM output block)


def _kernel(bounds_ref, vecs_ref, cov_y_ref, cov_x_ref, out_ref):
    """One (b, th, tw) tile.

    Batched MXU contraction out[d,h,w] = sum_o cy[h,o]·cx[o,w]·v[d,o] with
    zero in-kernel reshapes/transposes (Mosaic layout restrictions): operands
    arrive pre-transposed from the host. Whole tiles with no overlapping
    object (scalar test over the prefetched box bounds) skip all vector work.

    bounds_ref:  scalar-prefetch (B, O, 4) int32 [y_lo, y_hi, x_lo, x_hi]
    vecs_ref:   (Dc, O) VMEM (feature chunk, transposed)
    cov_y_ref:  (O, H) VMEM
    cov_x_ref:  (O, W) VMEM
    out_ref:    (Dc, TH, TW) VMEM (caller transposes back outside)
    """
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    y_start = pl.multiple_of(ti * TH, TH)
    x_start = pl.multiple_of(tj * TW, TW)
    Dc, O = vecs_ref.shape

    def count_overlaps(o, acc):
        y_lo = bounds_ref[b, o, 0]
        y_hi = bounds_ref[b, o, 1]
        x_lo = bounds_ref[b, o, 2]
        x_hi = bounds_ref[b, o, 3]
        hit = jnp.logical_and(
            jnp.logical_and(y_lo < ti * TH + TH, y_hi > ti * TH),
            jnp.logical_and(x_lo < tj * TW + TW, x_hi > tj * TW))
        return acc + hit.astype(jnp.int32)

    n_hit = jax.lax.fori_loop(0, O, count_overlaps, 0)

    out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(n_hit > 0)
    def _():
        cy = cov_y_ref[:, pl.ds(y_start, TH)]          # (O, TH)
        cx = cov_x_ref[:, pl.ds(x_start, TW)]          # (O, TW)
        v_t = vecs_ref[...]                            # (Dc, O)
        # contraction runs over the middle (O) dim — the minor lane dims stay
        # 128-aligned (TH/TW), which Mosaic requires
        lhs = jnp.broadcast_to(cy[None], (Dc, O, TH))
        rhs = v_t[:, :, None] * cx[None, :, :]         # (Dc, O, TW) VPU
        out = jax.lax.dot_general(
            lhs, rhs,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (Dc, TH, TW) MXU
        out_ref[...] = out


def _coverage_bounds(boxes, H: int, W: int):
    """Integer pixel support of each object's trapezoid coverage (B, O, 4).

    Along x: cov > 0 where -1 < (u - x0)/w * (TILE-1) < TILE, i.e.
    x in (x0 - w/(TILE-1), x0 + w + w/(TILE-1)) scaled by (W-1) pixels.
    """
    def axis_bounds(start, size, n):
        margin = size / (TILE - 1)
        lo = (start - margin) * (n - 1)
        hi = (start + size + margin) * (n - 1) + 1.0
        bad = size <= 0
        lo = jnp.where(bad, n, lo)
        hi = jnp.where(bad, -1, hi)
        return (jnp.clip(jnp.floor(lo), 0, n).astype(jnp.int32),
                jnp.clip(jnp.ceil(hi), -1, n).astype(jnp.int32))

    y_lo, y_hi = axis_bounds(boxes[..., 1], boxes[..., 3], H)
    x_lo, x_hi = axis_bounds(boxes[..., 0], boxes[..., 2], W)
    return jnp.stack([y_lo, y_hi, x_lo, x_hi], axis=-1)


def _splat_fwd_impl(vecs, boxes, H: int, W: int, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, O, D = vecs.shape
    cov_y, cov_x = box_coverage(boxes, H, W)          # (B,O,H), (B,O,W)
    bounds = _coverage_bounds(boxes, H, W)

    def kernel(bounds_ref, vecs_ref, cy_ref, cx_ref, out_ref):
        _kernel(bounds_ref, vecs_ref.at[0], cy_ref.at[0], cx_ref.at[0],
                out_ref.at[0])

    def one_chunk(vecs_chunk_t):
        """One pallas_call over a transposed (B, Dc, O) feature chunk."""
        Dc = vecs_chunk_t.shape[1]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H // TH, W // TW),
            in_specs=[
                pl.BlockSpec((1, Dc, O), lambda b, i, j, _: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, O, H), lambda b, i, j, _: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, O, W), lambda b, i, j, _: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Dc, TH, TW),
                                   lambda b, i, j, _: (b, 0, i, j),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, Dc, H, W), jnp.float32),
            interpret=interpret,
        )(bounds, vecs_chunk_t.astype(jnp.float32), cov_y, cov_x)
        return jnp.transpose(out, (0, 2, 3, 1))        # -> (B, H, W, Dc)

    vecs_t = jnp.transpose(vecs, (0, 2, 1))            # (B, D, O)
    if D <= TD:
        return one_chunk(vecs_t)
    chunks = [one_chunk(vecs_t[:, s:s + TD]) for s in range(0, D, TD)]
    return jnp.concatenate(chunks, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def boxes_to_layout_pallas(vecs, boxes, H: int, W: int,
                           interpret: bool | None = None):
    """Drop-in for ops.layout.boxes_to_layout (sum pooling) as a Pallas kernel.

    H and W must be multiples of 128 (canvas tiles); callers fall back to the
    XLA einsum path otherwise. interpret=None auto-selects interpreter mode
    off-TPU.
    """
    return _splat_fwd_impl(vecs, boxes, H, W, interpret)


def _splat_fwd(vecs, boxes, H, W, interpret):
    return _splat_fwd_impl(vecs, boxes, H, W, interpret), (vecs, boxes)


def _splat_bwd(H, W, interpret, res, g):
    """Exact dense backward (einsum): d vec[o,d] = sum_hw g * covY covX;
    d boxes via the coverage derivative chain (piecewise-linear trapezoid)."""
    vecs, boxes = res
    cov_y, cov_x = box_coverage(boxes, H, W)

    gx = jnp.einsum("bhwd,boh->bowd", g, cov_y)        # (B,O,W,D)
    d_vecs = jnp.einsum("bowd,bow->bod", gx, cov_x)

    # coverage derivative wrt pixel coordinate: +1 on the rising ramp,
    # -1 on the falling ramp, 0 elsewhere
    def cov_grads(start, size, n):
        from canonicalsg2im_tpu.ops.layout import _axis_pixel_coords

        x_pix = _axis_pixel_coords(start, size, n, TILE)
        rising = (x_pix > -1.0) & (x_pix < 0.0)
        falling = (x_pix > TILE - 1.0) & (x_pix < TILE)
        dcov_dpix = rising.astype(jnp.float32) - falling.astype(jnp.float32)
        # pix = (u - start)/size * (TILE-1)
        safe = jnp.where(size == 0, 1.0, size)[..., None]
        dpix_dstart = -(TILE - 1) / safe
        dpix_dsize = -x_pix / safe
        return dcov_dpix * dpix_dstart, dcov_dpix * dpix_dsize

    dcy_dy0, dcy_dh = cov_grads(boxes[..., 1], boxes[..., 3], H)
    dcx_dx0, dcx_dw = cov_grads(boxes[..., 0], boxes[..., 2], W)

    g_dot_v = jnp.einsum("bhwd,bod->bohw", g, vecs)    # (B,O,H,W)
    gy = jnp.einsum("bohw,bow->boh", g_dot_v, cov_x)   # dL/d cov_y
    gxx = jnp.einsum("bohw,boh->bow", g_dot_v, cov_y)  # dL/d cov_x
    d_x0 = jnp.einsum("bow,bow->bo", gxx, dcx_dx0)
    d_w = jnp.einsum("bow,bow->bo", gxx, dcx_dw)
    d_y0 = jnp.einsum("boh,boh->bo", gy, dcy_dy0)
    d_h = jnp.einsum("boh,boh->bo", gy, dcy_dh)
    d_boxes = jnp.stack([d_x0, d_y0, d_w, d_h], axis=-1)
    return d_vecs, d_boxes


boxes_to_layout_pallas.defvjp(_splat_fwd, _splat_bwd)


def splat_supported(H: int, W: int) -> bool:
    return H % TH == 0 and W % TW == 0
