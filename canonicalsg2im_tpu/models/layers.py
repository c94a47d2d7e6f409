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
