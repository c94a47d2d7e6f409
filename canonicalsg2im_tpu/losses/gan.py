"""GAN losses.

- ``GanLoss``: the SPADE-style multi-mode criterion (hinge / ls / original /
  wgan) handling multiscale list-of-list discriminator outputs
  (`spade/models/networks/loss.py:16-98`).
- ``gan_g_loss``/``gan_d_loss`` etc.: the classic criterion family used by the
  object discriminator (`sg2im/losses.py:5-129`).
"""
from __future__ import annotations

import jax.numpy as jnp


def bce_logits(logits, target):
    """Numerically stable BCE-with-logits, mean-reduced (sg2im/losses.py:23-41)."""
    neg_abs = -jnp.abs(logits)
    loss = jnp.clip(logits, 0.0, None) - logits * target + jnp.log1p(jnp.exp(neg_abs))
    return loss.mean()


class GanLoss:
    """Callable mirroring spade GANLoss. `preds` may be an array, a list of
    arrays, or a list of per-discriminator feature lists (the multiscale
    convention: the last entry of each inner list is the score map)."""

    def __init__(self, gan_mode: str = "hinge"):
        if gan_mode not in ("hinge", "ls", "original", "w"):
            raise ValueError(f"Unexpected gan_mode {gan_mode}")
        self.gan_mode = gan_mode

    def _single(self, x, target_is_real: bool, for_discriminator: bool):
        if self.gan_mode == "original":
            return bce_logits(x, jnp.full_like(x, float(target_is_real)))
        if self.gan_mode == "ls":
            return jnp.mean((x - float(target_is_real)) ** 2)
        if self.gan_mode == "hinge":
            if for_discriminator:
                if target_is_real:
                    return -jnp.mean(jnp.minimum(x - 1.0, 0.0))
                return -jnp.mean(jnp.minimum(-x - 1.0, 0.0))
            assert target_is_real, "generator hinge loss must aim for real"
            return -jnp.mean(x)
        # wgan
        return -jnp.mean(x) if target_is_real else jnp.mean(x)

    def __call__(self, preds, target_is_real: bool, for_discriminator: bool = True):
        if isinstance(preds, (list, tuple)):
            total = 0.0
            for p in preds:
                if isinstance(p, (list, tuple)):
                    p = p[-1]
                total = total + self._single(p, target_is_real, for_discriminator)
            return total / len(preds)
        return self._single(preds, target_is_real, for_discriminator)


def gan_g_loss(scores_fake):
    return bce_logits(scores_fake.reshape(-1), jnp.ones(scores_fake.size))


def gan_d_loss(scores_real, scores_fake):
    real = bce_logits(scores_real.reshape(-1), jnp.ones(scores_real.size))
    fake = bce_logits(scores_fake.reshape(-1), jnp.zeros(scores_fake.size))
    return real + fake


def wgan_g_loss(scores_fake):
    return -scores_fake.mean()


def wgan_d_loss(scores_real, scores_fake):
    return scores_fake.mean() - scores_real.mean()


def lsgan_g_loss(scores_fake):
    s = jnp.ravel(scores_fake)
    return jnp.mean((1.0 / (1.0 + jnp.exp(-s)) - 1.0) ** 2)


def lsgan_d_loss(scores_real, scores_fake):
    r = 1.0 / (1.0 + jnp.exp(-jnp.ravel(scores_real)))
    f = 1.0 / (1.0 + jnp.exp(-jnp.ravel(scores_fake)))
    return jnp.mean((r - 1.0) ** 2) + jnp.mean(f ** 2)


def gradient_penalty(x_real, x_fake, f, rng, gamma: float = 1.0):
    """WGAN-GP penalty (sg2im/losses.py:132-144): unit-gradient-norm on
    random interpolates (the reference draws eps ~ N(0,1), matched here)."""
    import jax

    N = x_real.shape[0]
    eps = jax.random.normal(rng, (N,) + (1,) * (x_real.ndim - 1),
                            dtype=x_real.dtype)
    x_hat = eps * x_real + (1.0 - eps) * x_fake

    def score(x):
        s = f(x)
        if s.ndim > 1:
            s = s.reshape(s.shape[0], -1).mean(axis=1)
        return s.sum()

    grad = jax.grad(score)(x_hat)
    norm = jnp.sqrt(jnp.sum(grad.reshape(N, -1) ** 2, axis=1) + 1e-12)
    return jnp.mean(((norm - gamma) ** 2) / (gamma * gamma))


def get_gan_losses(gan_type: str):
    table = {
        "gan": (gan_g_loss, gan_d_loss),
        "wgan": (wgan_g_loss, wgan_d_loss),
        "lsgan": (lsgan_g_loss, lsgan_d_loss),
    }
    if gan_type not in table:
        raise ValueError(f'Unrecognized GAN type "{gan_type}"')
    return table[gan_type]
