"""Re-apply the JAX_PLATFORMS env var.

This container's sitecustomize imports jax at interpreter start and latches
``jax_platforms`` before user code runs, so setting the env var afterwards has
no effect. Calling this first thing in every CLI restores the documented env
var behavior (e.g. ``JAX_PLATFORMS=cpu python -m scripts.train ...`` for a
no-TPU smoke run).
"""
from __future__ import annotations

import os


def apply_platform_override() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    if jax.config.jax_platforms != want:
        jax.config.update("jax_platforms", want)
