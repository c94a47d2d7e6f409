"""VGG19 feature extractor for the perceptual loss
(reference `spade/models/networks/architecture.py:93-123` + VGGLoss,
`loss.py:102-117`).

The reference consumes torchvision's pretrained VGG19 (a network-downloaded
native dependency, SURVEY.md §2.10). This container has no network and no
torchvision, so weights are resolved in order:

1. ``<weights_dir>/vgg19_features.npz`` — produced once from a torchvision
   checkpoint with ``scripts/convert_weights.py`` (HWIO kernels);
2. a deterministic fixed-seed random init (documented fallback: the loss is
   then a random-projection perceptual metric; relative training behavior is
   preserved, absolute parity with the reference requires the converted
   weights).

Matches the reference by feeding images in [-1, 1] with NO ImageNet
normalization (VGGLoss applies none — loss.py:109-117).
"""
from __future__ import annotations

import os
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# convs per stage for VGG19 ('E'); feature taps after the FIRST relu of each
# stage (relu1_1 ... relu5_1), torchvision feature indices 1, 6, 11, 20, 29.
VGG19_STAGES = ((64, 2), (128, 2), (256, 4), (512, 4), (512, 4))
VGG_LOSS_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


class VGG19Features(nn.Module):
    """Returns [relu1_1, relu2_1, relu3_1, relu4_1, relu5_1] (NHWC)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        conv_idx = 0
        for stage, (width, n_convs) in enumerate(VGG19_STAGES):
            if stage > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for c in range(n_convs):
                x = nn.Conv(width, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv{conv_idx}")(x)
                x = nn.relu(x)
                if c == 0:
                    taps.append(x)
                conv_idx += 1
                # only the convs up to each tap are needed for the loss; the
                # deepest tap is relu5_1, so stop right after it
                if stage == 4 and c == 0:
                    return taps
        return taps


def load_vgg_params(weights_dir: str, rng_seed: int = 42,
                    input_channels: int = 3):
    """Resolve VGG19 parameters: converted npz if present, else fixed-seed."""
    path = os.path.join(weights_dir, "vgg19_features.npz")
    model = VGG19Features()
    dummy = jnp.zeros((1, 64, 64, input_channels))
    params = model.init(jax.random.PRNGKey(rng_seed), dummy)["params"]
    if os.path.exists(path):
        data = np.load(path)
        loaded = {}
        for name in params:
            loaded[name] = {
                "kernel": jnp.asarray(data[f"{name}_kernel"]),
                "bias": jnp.asarray(data[f"{name}_bias"]),
            }
        return loaded, True
    return params, False


class VGGLoss:
    """Weighted multi-layer L1 perceptual loss (spade loss.py:102-117).

    x and y ride ONE batched VGG forward (the net is pure convs — batching is
    exact); only the x half carries gradient, matching the reference's
    ``y.detach()``."""

    def __init__(self, params, dtype=jnp.float32):
        self.params = params
        self.model = VGG19Features(dtype=dtype)

    def __call__(self, x, y):
        B = x.shape[0]
        both = jnp.concatenate([x, jax.lax.stop_gradient(y)], axis=0)
        feats = self.model.apply({"params": self.params}, both)
        loss = 0.0
        for w, f in zip(VGG_LOSS_WEIGHTS, feats):
            loss = loss + w * jnp.abs(
                f[:B] - jax.lax.stop_gradient(f[B:])).mean()
        return loss


def kld_loss(mu, logvar):
    """VAE KL (spade loss.py:121-123)."""
    return -0.5 * jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar))
