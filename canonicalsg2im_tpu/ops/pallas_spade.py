"""Fused SPADE (eval mode) as a single Pallas TPU kernel.

One SPADE application (reference spade/models/networks/normalization.py:66-110)
is, in eval mode:

    normalized = (x - running_mean) * rsqrt(running_var + eps)   # elementwise
    actv  = relu(conv3x3(seg, w_shared))                         # seg -> 128
    gamma = conv3x3(actv, w_gamma)                               # 128 -> C
    beta  = conv3x3(actv, w_beta)                                # 128 -> C
    out   = normalized * (1 + gamma) + beta

XLA materializes `actv`, `gamma` and `beta` in HBM between the convs. This
kernel computes the whole chain in VMEM and writes only `out` — the fusion
pass SURVEY.md §7.7 names. Scope: the no-backward (inference/serving) path;
for training, the measured XLA equivalent of recompute-based fusion loses to
the default schedule (docs/PERF.md "surgical SPADE remat"), so the train path
keeps plain XLA convs.

Layout: whole-plane kernel, grid (B, C/Cc) — each step loads one image's
padded seg plane and one output-channel chunk. The shared-conv activation
plane is computed once per image (grid is sequential on TPU; a VMEM scratch
carries it across channel chunks). Supported when the spatial plane fits
VMEM: H*W <= 64*64 (the generator pyramid's 8..64 px blocks; 128+ px blocks
fall back to XLA).

Convs are expressed as 9 shifted (rows, W, Cin) x (Cin, Cout) contractions
batched over rows — the same Mosaic-friendly pattern as ops/pallas_splat.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NHIDDEN = 128   # SPADE's fixed hidden width (normalization.py:96)
CC = 128        # output-channel chunk per grid step
MAX_PLANE = 64 * 64  # largest H*W the whole-plane kernel supports


def _conv3x3(src, w9, rows: int, cols: int):
    """Σ_k src[dy:dy+rows, dx:dx+cols, :] @ w9[k]: a 3x3 VALID conv over a
    pre-padded plane, as 9 shifted MXU contractions. The weight operand is
    NOT broadcast over rows (an earlier row-batched form put 9 live
    (rows, cin, cout) broadcasts on the VMEM stack and overflowed it)."""
    cout = w9.shape[-1]
    acc = jnp.zeros((rows, cols, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            lhs = src[dy:dy + rows, dx:dx + cols, :]
            acc += jax.lax.dot_general(
                lhs, w9[3 * dy + dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc


def _kernel(x_ref, seg_ref, wsh_ref, bsh_ref, wg_ref, bg_ref, wb_ref,
            bb_ref, mu_ref, var_ref, out_ref, actv_ref, *, eps: float):
    c = pl.program_id(1)
    H, W = out_ref.shape[0], out_ref.shape[1]

    @pl.when(c == 0)
    def _():
        # activation plane with a 1-px ring for the second conv. The ring is
        # ZEROED: the reference's gamma/beta convs are SAME-padded over the
        # (H, W) activation, i.e. they read zeros outside it — not the values
        # the shared conv would produce there from the padded seg.
        seg = seg_ref[...]
        a = _conv3x3(seg, wsh_ref[...], H + 2, W + 2)
        a = jnp.maximum(a + bsh_ref[...][0][None, None, :], 0.0)
        row = jax.lax.broadcasted_iota(jnp.int32, (H + 2, W + 2, 1), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (H + 2, W + 2, 1), 1)
        interior = ((row >= 1) & (row <= H) & (col >= 1)
                    & (col <= W)).astype(jnp.float32)
        actv_ref[...] = (a * interior).astype(actv_ref.dtype)

    # gamma is applied (and dead) before beta is computed — halves the live
    # (H, W, cc) affine planes on the VMEM stack vs computing both up front
    actv = actv_ref[...]
    x = x_ref[...].astype(jnp.float32)
    inv = jax.lax.rsqrt(var_ref[...][0].astype(jnp.float32) + eps)
    normalized = (x - mu_ref[...][0][None, None, :]) * inv[None, None, :]
    gamma = _conv3x3(actv, wg_ref[...], H, W) + bg_ref[...][0][None, None, :]
    out = normalized * (1.0 + gamma)
    beta = _conv3x3(actv, wb_ref[...], H, W) + bb_ref[...][0][None, None, :]
    out_ref[...] = (out + beta).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def spade_fused_eval(x, seg, w_shared, b_shared, w_gamma, b_gamma, w_beta,
                     b_beta, mean, var, *, eps: float = 1e-5,
                     interpret: bool | None = None):
    """Fused eval-mode SPADE. x: (B,H,W,C); seg: (B,H,W,Ci) already resized
    to x's resolution; conv weights in flax HWIO ((3,3,Cin,Cout)); mean/var
    the norm's running statistics (C,).

    C must be a multiple of CC (the generator's channel widths 128..1024 all
    are) and H*W <= MAX_PLANE; callers gate on :func:`spade_fused_supported`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, C = x.shape
    Ci = seg.shape[-1]
    cc = _channel_chunk(C, H, W)
    seg_pad = jnp.pad(seg, ((0, 0), (2, 2), (2, 2), (0, 0)))
    # the shared activation plane + conv weights ride the compute dtype
    # (bf16 in the generator): MXU-native operands, f32 accumulation —
    # matching the precision of the XLA path, whose convs run in self.dtype
    wsh = w_shared.reshape(9, Ci, NHIDDEN).astype(seg.dtype)
    wg = w_gamma.reshape(9, NHIDDEN, C).astype(x.dtype)
    wb = w_beta.reshape(9, NHIDDEN, C).astype(x.dtype)
    # 1-D vectors ride as (1, N): XLA tiles f32[N] as T(N) (no 128-lane
    # tiling), which Mosaic cannot block — 2-D rows get the (8,128) layout
    row = lambda v: v.reshape(1, -1)
    b_shared, b_gamma, b_beta = row(b_shared), row(b_gamma), row(b_beta)
    mean, var = row(mean), row(var)

    def kernel(x_r, seg_r, wsh_r, bsh_r, wg_r, bg_r, wb_r, bb_r, mu_r,
               var_r, out_r, actv_r):
        _kernel(x_r.at[0], seg_r.at[0], wsh_r, bsh_r, wg_r, bg_r, wb_r,
                bb_r, mu_r, var_r, out_r.at[0], actv_r, eps=eps)

    grid = (B, C // cc)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, W, cc), lambda b, c: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H + 4, W + 4, Ci), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, Ci, NHIDDEN), lambda b, c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NHIDDEN), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, NHIDDEN, cc), lambda b, c: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cc), lambda b, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, NHIDDEN, cc), lambda b, c: (0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cc), lambda b, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cc), lambda b, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cc), lambda b, c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, cc), lambda b, c: (b, 0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((H + 2, W + 2, NHIDDEN), x.dtype)],
        # the fat-channel 32x32 blocks need ~17 MB of stack+blocks; raise the
        # compiler's conservative 16 MB scoped-vmem default (v5e has headroom)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, seg_pad, wsh, b_shared, wg, b_gamma, wb, b_beta, mean, var)


def _channel_chunk(C: int, H: int, W: int) -> int:
    """Output-channel chunk per grid step: a multiple of 128 (Mosaic
    lane-dim block rule) or the full (thin) C; larger chunks on small
    planes cut grid steps, while H*W*cc stays bounded so the per-step VMEM
    stack fits the 16 MB limit."""
    return min(C, max(CC, ((64 * 1024) // (H * W)) // CC * CC))


def spade_fused_supported(H: int, W: int, C: int, norm_kind: str) -> bool:
    """Gate for the fused eval path: batch-stats norms (running statistics
    are elementwise in eval), plane small enough for VMEM, channel width a
    multiple of the chunk the kernel will actually use (e.g. C=384 at 16x16
    picks cc=256 and 384 % 256 != 0 — unsupported, even though 384 % 128
    == 0)."""
    return (norm_kind in ("syncbatch", "batch") and H * W <= MAX_PLANE
            and C % _channel_chunk(C, H, W) == 0)
