"""Shared NN building blocks (flax) — counterpart of `sg2im/layers.py`.

``build_mlp``/``build_cnn`` keep the reference's arch-string conventions
(`sg2im/layers.py:6-112`) so configs like ``--d_obj_arch C4-64-2,...`` work
unchanged. All convolutions are NHWC (TPU-native).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def get_activation(name: str) -> Callable:
    if name.lower().startswith("leakyrelu"):
        slope = float(name.split("-")[1]) if "-" in name else 0.01
        return lambda x: nn.leaky_relu(x, negative_slope=slope)
    table = {
        "relu": nn.relu,
        "sigmoid": nn.sigmoid,
        "tanh": jnp.tanh,
    }
    if name.lower() not in table:
        raise ValueError(f"Invalid activation {name!r}")
    return table[name.lower()]


class MLP(nn.Module):
    """Linear(/BN/act) stack mirroring build_mlp (sg2im/layers.py:6-25)."""

    dims: Sequence[int]
    activation: str = "relu"
    batch_norm: str = "none"
    final_nonlinearity: Optional[str] = "relu"
    kernel_init: Optional[Callable] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = get_activation(self.activation)
        init = self.kernel_init or nn.initializers.lecun_normal()
        n = len(self.dims)
        for i, dim in enumerate(self.dims):
            x = nn.Dense(dim, kernel_init=init, dtype=self.dtype)(x)
            if i < n - 1:
                if self.batch_norm == "batch":
                    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                     epsilon=1e-5)(x)
                x = act(x)
        if self.final_nonlinearity is not None:
            x = get_activation(self.final_nonlinearity)(x)
        return x


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
    backward — measured as the largest per-norm HBM sink of the GAN step at
    256² (scripts/profile_gan_step.py). Here the statistics are f32
    accumulations fused off the raw input and the normalize is a single
    elementwise fusion back to the input dtype. Under a data-sharded jit the
    batch reduces are global (SyncBN), exactly as with flax BatchNorm."""

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
    against lax.conv in tests/test_layers_extra.py."""
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
    elementwise pass instead of XLA's select-and-scatter (measured ~2 ms/step
    of the GAN step inside the VGG loss, scripts/profile_gan_step.py).

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


def upsample_nearest(x, factor: int = 2):
    """Nearest-neighbor x2 upsampling (NHWC) — F.interpolate(scale_factor=2)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, factor, W, factor, C))
    return x.reshape(B, H * factor, W * factor, C)


def resize_nearest(x, size):
    """F.interpolate(mode='nearest') to an arbitrary size (NHWC).

    PyTorch nearest uses floor(dst * src / dst_size) index selection.
    """
    B, H, W, C = x.shape
    h2, w2 = size
    if (H, W) == (h2, w2):
        return x  # identity — avoid an index-gather XLA may not simplify
    hi = (jnp.arange(h2) * H // h2).astype(jnp.int32)
    wi = (jnp.arange(w2) * W // w2).astype(jnp.int32)
    return x[:, hi][:, :, wi]


def avg_pool_3x3_s2(x):
    """F.avg_pool2d(kernel=3, stride=2, padding=1, count_include_pad=False) —
    the multiscale-discriminator downsampler (spade discriminator.py:92-93)."""
    ones = jnp.ones_like(x[..., :1])
    summed = nn.avg_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                         count_include_pad=True) * 9.0
    counts = nn.avg_pool(ones, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                         count_include_pad=True) * 9.0
    return summed / counts


class CNN(nn.Module):
    """Arch-string CNN (build_cnn, sg2im/layers.py:28-112). NHWC.

    Supports the layer specs used by the reference configs:
    IX, CK-X[-S], R, UX, PX, FC-D-D. Normalization precedes every conv except
    the first.
    """

    arch: str
    normalization: str = "batch"
    activation: str = "relu"
    padding: str = "same"
    pooling: str = "max"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        specs = self.arch.split(",") if isinstance(self.arch, str) else list(self.arch)
        act = get_activation(self.activation)
        first_conv = True

        def norm(y):
            if self.normalization == "batch":
                return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5)(y)
            if self.normalization == "instance":
                return nn.GroupNorm(num_groups=None, group_size=1,
                                    use_bias=False, use_scale=False)(y)
            if self.normalization == "none":
                return y
            raise ValueError(self.normalization)

        if specs and specs[0][0] == "I":
            specs = specs[1:]
        for s in specs:
            if s[0] == "C":
                vals = [int(v) for v in s[1:].split("-")]
                K, C = vals[0], vals[1]
                stride = vals[2] if len(vals) == 3 else 1
                if not first_conv:
                    x = norm(x)
                    x = act(x)
                first_conv = False
                pad = "SAME" if self.padding == "same" else "VALID"
                x = nn.Conv(C, (K, K), strides=(stride, stride), padding=pad,
                            dtype=self.dtype)(x)
            elif s[0] == "R":
                res_in = x
                y = norm(x) if not first_conv else x
                y = act(y)
                y = nn.Conv(x.shape[-1], (3, 3), padding="SAME",
                            dtype=self.dtype)(y)
                y = norm(y)
                y = act(y)
                y = nn.Conv(x.shape[-1], (3, 3), padding="SAME",
                            dtype=self.dtype)(y)
                x = res_in + y
                first_conv = False
            elif s[0] == "U":
                x = upsample_nearest(x, int(s[1:]))
            elif s[0] == "P":
                f = int(s[1:])
                pool = nn.max_pool if self.pooling == "max" else nn.avg_pool
                x = pool(x, (f, f), strides=(f, f))
            elif s.startswith("FC"):
                _, din, dout = s.split("-")
                x = x.reshape(x.shape[0], -1)
                x = nn.Dense(int(dout))(x)
            else:
                raise ValueError(f"Invalid layer {s!r}")
        return x


class GlobalAvgPool(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x.mean(axis=(1, 2))  # NHWC -> NC


class ResidualBlock(nn.Module):
    """Standalone pre-activation residual block (sg2im/layers.py:190-218):
    norm -> act -> 3x3 conv -> norm -> act -> 3x3 conv + skip."""

    channels: int
    normalization: str = "batch"
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = get_activation(self.activation)

        def norm(y):
            if self.normalization == "batch":
                return nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5)(y)
            if self.normalization == "instance":
                return nn.GroupNorm(num_groups=None, group_size=1,
                                    use_bias=False, use_scale=False)(y)
            return y

        y = act(norm(x))
        y = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(y)
        y = act(norm(y))
        y = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(y)
        return x + y


class Interpolate(nn.Module):
    """Module wrapper over resize (sg2im/layers.py:221-231) — nearest only,
    matching the reference's F.interpolate default."""

    scale_factor: int = 2
    size: Optional[tuple] = None

    @nn.compact
    def __call__(self, x):
        if self.size is not None:
            return resize_nearest(x, self.size)
        return upsample_nearest(x, self.scale_factor)


class ConditionalBatchNorm2d(nn.Module):
    """Class-conditional BN (sg2im/layers.py:246-258, unused in the main
    path): param-free BN, then per-class (gamma, beta) from an embedding."""

    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y, train: bool = True):
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, use_bias=False, use_scale=False)(x)
        C = x.shape[-1]
        table = nn.Embed(self.num_classes, 2 * C,
                         embedding_init=nn.initializers.normal(0.02))(y)
        gamma, beta = jnp.split(table, 2, axis=-1)
        # (B, 2C) conditioning broadcast over H, W
        return h * (1.0 + gamma[:, None, None, :]) + beta[:, None, None, :]


def weight_initializer(init_type: str = "xavier", gain: float = 0.02):
    """Kernel initializer matching BaseNetwork.init_weights
    (spade base_network.py:26-52): normal / xavier / kaiming / orthogonal."""
    if init_type == "normal":
        return nn.initializers.normal(stddev=gain)
    if init_type in ("xavier", "glorot"):
        return nn.initializers.variance_scaling(
            gain * gain, "fan_avg", "truncated_normal")
    if init_type == "kaiming":
        return nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    if init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=gain)
    raise ValueError(f"unknown init_type {init_type!r}")


def apply_init_weights(params, rng, init_type: str = "xavier",
                       gain: float = 0.02):
    """Re-initialize every conv/dense kernel of a param tree in one pass —
    the functional analogue of the reference's post-construction
    `net.apply(init_weights)` sweep (spade base_network.py:10-59). Biases,
    norm scales, and embeddings are left at their flax defaults, matching
    the reference's module filter ('Conv'/'Linear' in classname)."""
    init = weight_initializer(init_type, gain)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    keys = jax.random.split(rng, len(flat))
    out = []
    for k, (path, leaf) in zip(keys, flat):
        name = str(path[-1])
        if "kernel" in name and hasattr(leaf, "ndim") and leaf.ndim >= 2:
            out.append(init(k, leaf.shape, leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
