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
TDL = 128  # NHWC-variant feature chunk (the output block's lane dim)
THN = 64  # NHWC-variant tile height: the (THN, TW, TDL) f32 output block is
#           4 MB, so double buffering stays under the 16 MB scoped-vmem limit
O_MAX_NHWC = 64  # VMEM bound for the NHWC kernel's (THN, TW, O) broadcast


def _count_tile_overlaps(bounds_ref, b, ti, tj, th, tw, O):
    """Scalar test shared by all splat kernels: how many of the O objects'
    prefetched [y_lo, y_hi, x_lo, x_hi) bounds intersect tile (ti, tj) of
    th x tw pixels. Tiles with zero hits skip all vector work."""
    def count(o, acc):
        y_lo = bounds_ref[b, o, 0]
        y_hi = bounds_ref[b, o, 1]
        x_lo = bounds_ref[b, o, 2]
        x_hi = bounds_ref[b, o, 3]
        hit = jnp.logical_and(
            jnp.logical_and(y_lo < ti * th + th, y_hi > ti * th),
            jnp.logical_and(x_lo < tj * tw + tw, x_hi > tj * tw))
        return acc + hit.astype(jnp.int32)

    return jax.lax.fori_loop(0, O, count, 0)


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
    n_hit = _count_tile_overlaps(bounds_ref, b, ti, tj, TH, TW, O)

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


def _kernel_nhwc(bounds_ref, vecs_ref, cy_t_ref, cx_t_ref, out_ref):
    """One (b, th, tw, dchunk) tile, written NHWC directly.

    out[h, w, d] = sum_o cyT[h, o] * cxT[w, o] * v[o, d], computed as a
    dot_general batched over h: (TH, TW, O) x (TH, O, TDL) -> (TH, TW, TDL).
    No in- or post-kernel transposes: coverage arrives host-transposed
    ((H, O) / (W, O), tiny arrays) and the output block's minor dim is the
    feature chunk — a native NHWC lane layout.

    bounds_ref: scalar-prefetch (B, O, 4) int32 [y_lo, y_hi, x_lo, x_hi]
    vecs_ref:  (O, TDL) VMEM feature chunk
    cy_t_ref:  (TH, O) VMEM (transposed coverage rows for this tile)
    cx_t_ref:  (TW, O) VMEM
    out_ref:   (TH, TW, TDL) VMEM
    """
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    O = vecs_ref.shape[0]
    th = cy_t_ref.shape[0]
    tw = cx_t_ref.shape[0]
    n_hit = _count_tile_overlaps(bounds_ref, b, ti, tj, th, tw, O)

    out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(n_hit > 0)
    def _():
        cy = cy_t_ref[...]                                # (th, O)
        cx = cx_t_ref[...]                                # (tw, O)
        v = vecs_ref[...]                                 # (O, TDL)
        lhs = cx[None, :, :] * cy[:, None, :]             # (th, tw, O) VPU
        rhs = jnp.broadcast_to(v[None], (cy.shape[0],) + v.shape)
        out_ref[...] = jax.lax.dot_general(
            lhs, rhs,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # (th, tw, TDL) MXU


def _splat_fwd_nhwc(vecs, boxes, H: int, W: int, interpret):
    """NHWC-direct forward: used when D is a multiple of TDL and O is small
    enough for the (TH, TW, O) VMEM broadcast."""
    B, O, D = vecs.shape
    cov_y, cov_x = box_coverage(boxes, H, W)              # (B,O,H), (B,O,W)
    bounds = _coverage_bounds(boxes, H, W)
    cy_t = jnp.swapaxes(cov_y, 1, 2)                      # (B, H, O)
    cx_t = jnp.swapaxes(cov_x, 1, 2)                      # (B, W, O)

    def kernel(bounds_ref, vecs_ref, cy_ref, cx_ref, out_ref):
        _kernel_nhwc(bounds_ref, vecs_ref.at[0], cy_ref.at[0], cx_ref.at[0],
                     out_ref.at[0])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // THN, W // TW, D // TDL),
        in_specs=[
            pl.BlockSpec((1, O, TDL), lambda b, i, j, k, _: (b, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, THN, O), lambda b, i, j, k, _: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TW, O), lambda b, i, j, k, _: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, THN, TW, TDL),
                               lambda b, i, j, k, _: (b, i, j, k),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, D), jnp.float32),
        interpret=interpret,
    )(bounds, vecs.astype(jnp.float32), cy_t, cx_t)


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
    if D % TDL == 0 and O <= O_MAX_NHWC:
        return _splat_fwd_nhwc(vecs, boxes, H, W, interpret)
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


# ----------------------------------------------------------- mask-path splat

def _mask_bounds(boxes, H: int, W: int, M: int):
    """Pixel support of each mask's bilinear sample (zero outside
    pix in (-1, M), the grid_sample zero-padding support)."""
    def axis_bounds(start, size, n):
        margin = size / (M - 1)
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


def _interp_taps(pix, M: int):
    """(R, M, O) bilinear tap tensor for pixel coords pix (R, O) — the
    in-kernel twin of ops.layout._interp_matrix (taps outside [0, M-1] drop
    out via the failed equality, i.e. grid_sample zero padding). Axis order
    puts O minor so everything stays lane-aligned with zero transposes."""
    R, O = pix.shape
    ix0 = jnp.floor(pix)
    w1 = pix - ix0
    w0 = 1.0 - w1
    m = jax.lax.broadcasted_iota(jnp.int32, (R, M, O), 1).astype(jnp.float32)
    return ((m == ix0[:, None, :]) * w0[:, None, :]
            + (m == ix0[:, None, :] + 1.0) * w1[:, None, :])


def _kernel_masks(bounds_ref, boxesv_ref, vecs_ref, masks_ref, out_ref, *,
                  H: int, W: int):
    """One (b, th, tw, dchunk) tile of the mask-path splat, NHWC-direct.

    out[h, w, d] = sum_o sample(mask_o, box_o)[h, w] * v[o, d]. All objects
    are processed batched with O as the minor (lane) axis — Mosaic forbids
    dynamically slicing sub-128 minor dims, so per-object loops/slices are
    avoided entirely: the two bilinear interpolation contractions run as
    static M-step VPU multiply-accumulates and the final feature contraction
    is one row-batched MXU dot (the boxes-NHWC pattern). Whole tiles with no
    overlapping object skip all vector work via the prefetched bounds.

    bounds_ref: scalar-prefetch (B, O, 4) int32
    boxesv_ref: (O, 4) VMEM float32 xywh
    vecs_ref:   (O, TDL) VMEM
    masks_ref:  (M, M, O) VMEM (host-transposed)
    out_ref:    (THN, TW, TDL) VMEM
    """
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    M, _, O = masks_ref.shape
    th, tw = out_ref.shape[0], out_ref.shape[1]
    n_hit = _count_tile_overlaps(bounds_ref, b, ti, tj, th, tw, O)

    out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(n_hit > 0)
    def _():
        boxesv = boxesv_ref[...]                          # (O, 4)
        x0, y0 = boxesv[:, 0], boxesv[:, 1]
        w, h = boxesv[:, 2], boxesv[:, 3]
        # Mosaic only supports integer iota; cast to f32 after
        u_y = ((jax.lax.broadcasted_iota(jnp.int32, (th, 1), 0)
                .astype(jnp.float32) + ti * th) / (H - 1))  # (th, 1)
        u_x = ((jax.lax.broadcasted_iota(jnp.int32, (tw, 1), 0)
                .astype(jnp.float32) + tj * tw) / (W - 1))
        safe_w = jnp.where(w == 0, 1.0, w)
        safe_h = jnp.where(h == 0, 1.0, h)
        # zero-size boxes vanish, like ops.layout._axis_pixel_coords
        pix_y = jnp.where(h[None, :] == 0, -1.0,
                          (u_y - y0[None, :]) / safe_h[None, :]) * (M - 1)
        pix_x = jnp.where(w[None, :] == 0, -1.0,
                          (u_x - x0[None, :]) / safe_w[None, :]) * (M - 1)
        ry = _interp_taps(pix_y, M)                       # (th, M, O)
        rx = _interp_taps(pix_x, M)                       # (tw, M, O)
        masks = masks_ref[...]                            # (M, M, O)

        # rows[t, n, o] = sum_m ry[t, m, o] * masks[m, n, o]
        rows = jnp.zeros((th, M, O), jnp.float32)
        for m in range(M):
            rows += ry[:, m, :][:, None, :] * masks[m][None, :, :]
        # tile[t, x, o] = sum_n rows[t, n, o] * rx[x, n, o]
        tile = jnp.zeros((th, tw, O), jnp.float32)
        for n in range(M):
            tile += rows[:, n, :][:, None, :] * rx[:, n, :][None, :, :]

        v = vecs_ref[...]                                 # (O, TDL)
        rhs = jnp.broadcast_to(v[None], (th,) + v.shape)
        out_ref[...] = jax.lax.dot_general(
            tile, rhs,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # (th, tw, TDL) MXU


def _mask_splat_fwd_impl(vecs, boxes, masks, H: int, W: int, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, O, D = vecs.shape
    M = masks.shape[-1]
    bounds = _mask_bounds(boxes, H, W, M)
    masks_t = jnp.transpose(masks.astype(jnp.float32), (0, 2, 3, 1))

    def kernel(bounds_ref, boxesv_ref, vecs_ref, masks_ref, out_ref):
        _kernel_masks(bounds_ref, boxesv_ref.at[0], vecs_ref.at[0],
                      masks_ref.at[0], out_ref.at[0], H=H, W=W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // THN, W // TW, D // TDL),
        in_specs=[
            pl.BlockSpec((1, O, 4), lambda b, i, j, k, _: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O, TDL), lambda b, i, j, k, _: (b, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, M, O), lambda b, i, j, k, _: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, THN, TW, TDL),
                               lambda b, i, j, k, _: (b, i, j, k),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, D), jnp.float32),
        interpret=interpret,
    )(bounds, boxes.astype(jnp.float32), vecs.astype(jnp.float32), masks_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def masks_to_layout_pallas(vecs, boxes, masks, H: int, W: int,
                           interpret: bool | None = None):
    """Drop-in for ops.layout.masks_to_layout (training mode, sum pooling) as
    a sparse Pallas kernel: work proportional to total mask support instead of
    O x H x W. Same bilinear zero-padding semantics as the dense path
    (reference masks_to_layout, sg2im/layout.py:48-77)."""
    return _mask_splat_fwd_impl(vecs, boxes, masks, H, W, interpret)


def _mask_splat_fwd(vecs, boxes, masks, H, W, interpret):
    return (_mask_splat_fwd_impl(vecs, boxes, masks, H, W, interpret),
            (vecs, boxes, masks))


def _mask_splat_bwd(H, W, interpret, res, g):
    """Exact dense backward: VJP of the (numerically identical) einsum path."""
    from canonicalsg2im_tpu.ops.layout import masks_to_layout

    vecs, boxes, masks = res
    _, vjp = jax.vjp(
        lambda v, b, m: masks_to_layout(v, b, m, H, W), vecs, boxes, masks)
    return vjp(g)


masks_to_layout_pallas.defvjp(_mask_splat_fwd, _mask_splat_bwd)


def mask_splat_supported(H: int, W: int, D: int, O: int, M: int) -> bool:
    return (H % TH == 0 and W % TW == 0 and D % TDL == 0
            and O <= O_MAX_NHWC and M >= 2)
