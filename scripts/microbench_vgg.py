"""Microbenchmark the VGG19 perceptual loss on the real chip.

The GAN-step ablation (scripts/ablate_gan_step.py) showed the VGG loss
costs ~360 ms of a 630 ms step at 256^2 batch 16 — ~25x its FLOP budget
(~2.3 TFLOP -> ~15 ms at the chip's measured 150 TFLOP/s matmul rate).
This isolates it and times variants to find the structural problem.

Sync is by value fetch (block_until_ready is a no-op on this backend).
"""
import time

import numpy as np

from canonicalsg2im_tpu.utils.platform import apply_platform_override

apply_platform_override()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from canonicalsg2im_tpu.models.vgg import (  # noqa: E402
    VGG19Features, VGG_LOSS_WEIGHTS, load_vgg_params)

B, H, W = 16, 256, 256
params, _ = load_vgg_params("weights")
x = jnp.asarray(np.random.RandomState(0).rand(B, H, W, 3) * 2 - 1,
                jnp.float32)
y = jnp.asarray(np.random.RandomState(1).rand(B, H, W, 3) * 2 - 1,
                jnp.float32)


def loss_two_applies(x, y, dtype):
    model = VGG19Features(dtype=dtype)
    fx = model.apply({"params": params}, x)
    fy = model.apply({"params": params}, y)
    loss = 0.0
    for w, a, b in zip(VGG_LOSS_WEIGHTS, fx, fy):
        loss = loss + w * jnp.abs(a - jax.lax.stop_gradient(b)).mean()
    return loss


def loss_concat(x, y, dtype):
    model = VGG19Features(dtype=dtype)
    taps = model.apply({"params": params}, jnp.concatenate([x, y], axis=0))
    loss = 0.0
    for w, t in zip(VGG_LOSS_WEIGHTS, taps):
        a, b = t[:B], t[B:]
        loss = loss + w * jnp.abs(a - jax.lax.stop_gradient(b)).mean()
    return loss


def run(tag, fn, grad, n=10):
    f = jax.grad(fn) if grad else fn
    f = jax.jit(f)
    t0 = time.perf_counter()
    out = f(x, y)
    float(jax.device_get(out if not grad else out.sum()))
    print(f"{tag}: compile+first {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(x, y)
    float(jax.device_get(out if not grad else out.sum()))
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt * 1000:.1f} ms", flush=True)


run("fwd bf16 two-applies", lambda a, b: loss_two_applies(a, b, jnp.bfloat16),
    grad=False)
run("fwd+xgrad bf16 two-applies",
    lambda a, b: loss_two_applies(a, b, jnp.bfloat16), grad=True)
run("fwd+xgrad bf16 concat", lambda a, b: loss_concat(a, b, jnp.bfloat16),
    grad=True)
run("fwd+xgrad f32 two-applies",
    lambda a, b: loss_two_applies(a, b, jnp.float32), grad=True)
