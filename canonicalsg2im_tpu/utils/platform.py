"""Re-apply the JAX_PLATFORMS env var.

This container's sitecustomize imports jax at interpreter start and latches
``jax_platforms`` before user code runs, so setting the env var afterwards has
no effect. Calling this first thing in every CLI restores the documented env
var behavior (e.g. ``JAX_PLATFORMS=cpu python -m scripts.train ...`` for a
no-TPU smoke run).
"""
from __future__ import annotations

import os

_CACHE_DIR = os.environ.get(
    "CSG2IM_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))




def apply_platform_override() -> None:
    """Re-apply JAX_PLATFORMS and enable the persistent compilation cache.

    TPU compiles go through a network tunnel here (~minutes for the full GAN
    step), so every CLI enables the on-disk executable cache.
    """
    import jax

    want = os.environ.get("JAX_PLATFORMS")
    if want and jax.config.jax_platforms != want:
        jax.config.update("jax_platforms", want)
    if (want or jax.config.jax_platforms or "") == "cpu":
        # NO persistent cache for the XLA:CPU backend. Two observed failure
        # modes, both fatal: (1) serializing a multi-device CPU executable
        # aborts the process inside jax's put_executable_and_time (SIGABRT
        # mid test-suite at the 8-device sharding tests); (2) CPU entries
        # embed host-specific AOT code and this VM migrates between machines
        # with different CPU feature sets (cpu_aot_loader "machine features
        # don't match" -> SIGILL). TPU executables have neither problem.
        return
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        # min-compile-time MUST be 0 here: the tunnel'd TPU backend compiles
        # asynchronously, so the client-measured compile time is ~0s and any
        # positive threshold skips every write (root cause of the round-1
        # "executables are NOT cached across processes" note — measured:
        # 4.4s -> 0.12s across processes once entries are written)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # cache is best-effort
