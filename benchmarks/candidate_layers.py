"""Candidate TPU primitives that did NOT earn a spot in the product tree.

Each is a drop-in equivalent of a stock op, built to attack a specific
lane-starvation / HBM pattern seen in the GAN-step profile, equivalence-
tested (tests/test_candidate_layers.py), and A/B-measured on the chip —
and each measured neutral or negative at the shipped configuration, so it
lives here rather than in `canonicalsg2im_tpu/` (policy: nothing unreachable
rides in the product package). Measured verdicts:

- ``BatchStatsNorm`` in SPADE's param-free norm: 81.29 vs 81.42 imgs/s
  baseline (neutral — XLA already fuses the f32 upcast into the stats
  reduction; docs/logs/ab_r3.log "bsn").
- ``max_pool_2x2`` in the VGG loss: 79.27 vs 81.42 (−2.6%; the custom VJP's
  windowed compare chain costs more than select-and-scatter at these shapes;
  docs/logs/ab_r3.log "vggpool").
- ``conv_via_patches``/``SmallCinConv`` on the PatchGAN/VGG first convs and
  the four-change batch including all of the above: −11% in aggregate
  (docs/ROUND2_NOTES.md "Session 6", reverted in 95e4fdc).

Kept because the analysis is right even though the wins didn't materialize
at batch 16 / 256²: on a future config where the profile shows the same
sinks dominating (bigger batch, no remat, different resolution), re-run the
A/B from here. See docs/PERF.md "Reverted experiments" for the full story.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def batch_stats_f32(x, axes, keepdims: bool = False):
    """(mean, var) over ``axes`` with float32 *accumulation* directly off the
    (possibly bf16) input — no materialized float32 upcast of the activation.

    Fast variance E[x²]−E[x]² clipped at 0, matching flax's
    ``_compute_stats(use_fast_variance=True)``. bf16→f32 conversion is
    value-exact, so the statistics equal the cast-then-reduce ones up to f32
    reduction order."""
    mean = jnp.mean(x, axis=axes, dtype=jnp.float32, keepdims=keepdims)
    mean2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=axes,
                     keepdims=keepdims)
    return mean, jnp.maximum(mean2 - jnp.square(mean), 0.0)


def instance_norm_f32(x, epsilon: float = 1e-5):
    """Param-free instance norm: f32-accumulated per-(batch, channel) spatial
    statistics, one elementwise normalize fused back to the input dtype."""
    mean, var = batch_stats_f32(x, axes=(1, 2), keepdims=True)
    y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + epsilon)
    return y.astype(x.dtype)


class BatchStatsNorm(nn.Module):
    """Param-free batch normalization that never materializes a float32 copy
    of a half-precision input.

    Drop-in for ``nn.BatchNorm(use_bias=False, use_scale=False)``: identical
    ``batch_stats`` tree ({mean, var}, float32, shape (C,)), fast-variance
    statistics, and momentum update — so existing checkpoints and the
    reference importer/exporter are untouched. The difference is purely how
    the program is expressed: flax promotes the input to float32 (as does an
    explicit upstream ``astype``), and under the resblock remat XLA
    materializes that full-size f32 activation and re-reads it in the
    backward. Here the statistics are f32 accumulations fused off the raw
    input and the normalize is a single elementwise fusion back to the input
    dtype. Under a data-sharded jit the batch reduces are global (SyncBN),
    exactly as with flax BatchNorm."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, var = batch_stats_f32(x, axes=tuple(range(x.ndim - 1)))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y.astype(x.dtype)


def conv_via_patches(x, kernel, strides, padding):
    """2-D convolution of a *small-channel* input expressed as extract-patches
    followed by one MXU matmul (NHWC / HWIO, same contract as
    ``lax.conv_general_dilated``).

    A direct conv whose input has C≪128 channels is lane-starved on TPU: the
    minor dimension tiles to 128 lanes, so a 3-channel image is stored ~40x
    inflated and its weight/input-gradient convs run at <1% of the MXU
    (measured 557 GFLOP/s on the PatchGAN first conv's img part,
    scripts/profile_gan_step.py). Re-expressing the conv over the
    (kh·kw·C)-channel patch tensor turns the forward AND both autodiff
    transposes into dense dot_generals: the weight grad becomes a
    [kh·kw·C, O] matmul and the input grad a matmul plus a fused
    overlap-add. Numerics: identical contraction arithmetic to the conv
    (both are f32-accumulated MXU passes over the same taps), verified
    against lax.conv in tests/test_candidate_layers.py."""
    kh, kw, ci, co = kernel.shape
    sh, sw = strides
    x = jnp.pad(x, ((0, 0), padding[0], padding[1], (0, 0)))
    H, W = x.shape[1], x.shape[2]
    Ho = (H - kh) // sh + 1
    Wo = (W - kw) // sw + 1
    taps = [x[:, dy:dy + (Ho - 1) * sh + 1:sh,
              dx:dx + (Wo - 1) * sw + 1:sw, :]
            for dy in range(kh) for dx in range(kw)]
    patches = jnp.concatenate(taps, axis=-1)
    # kernel[dy, dx, c, o] row-major-flattens to ((dy·kw+dx)·ci + c, o),
    # matching the tap concatenation order above
    return jnp.einsum("bhwk,ko->bhwo", patches,
                      kernel.reshape(kh * kw * ci, co))


class SmallCinConv(nn.Module):
    """Drop-in for ``nn.Conv`` (same {kernel, bias} param tree and
    initializers) that computes via ``conv_via_patches`` — for first-layer
    convs consuming RGB-like inputs."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: tuple = ((0, 0), (0, 0))  # explicit ((t, b), (l, r))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        y = conv_via_patches(x.astype(self.dtype), kernel.astype(self.dtype),
                             self.strides, self.padding)
        return y + bias.astype(self.dtype)


@jax.custom_vjp
def max_pool_2x2(x):
    """Non-overlapping 2x2/stride-2 max pool (NHWC) whose backward is a fused
    elementwise pass instead of XLA's select-and-scatter.

    Gradient routes to the FIRST maximal element of each window in row-major
    order — the same tie rule as torch's MaxPool2d backward and XLA's
    select-and-scatter, so this is a pure scheduling change."""
    return _max_pool_2x2_fwd(x)[0]


def _win(x):
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C)


def _max_pool_2x2_fwd(x):
    y = _win(x).max(axis=(2, 4))
    return y, (x, y)


def _max_pool_2x2_bwd(res, g):
    x, y = res
    xw = _win(x)
    w = xw == y[:, :, None, :, None, :]
    p00, p01 = w[:, :, 0, :, 0], w[:, :, 0, :, 1]
    p10, p11 = w[:, :, 1, :, 0], w[:, :, 1, :, 1]
    zero = jnp.zeros((), g.dtype)
    d00 = jnp.where(p00, g, zero)
    d01 = jnp.where(p01 & ~p00, g, zero)
    d10 = jnp.where(p10 & ~p00 & ~p01, g, zero)
    d11 = jnp.where(p11 & ~(p00 | p01 | p10), g, zero)
    rows = jnp.stack([jnp.stack([d00, d01], axis=3),
                      jnp.stack([d10, d11], axis=3)], axis=2)
    B, H, W, C = x.shape
    return (rows.reshape(B, H, W, C),)


max_pool_2x2.defvjp(_max_pool_2x2_fwd, _max_pool_2x2_bwd)
