import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (and never touch the real chip). The
# container's sitecustomize imports jax and latches JAX_PLATFORMS=axon before
# this file runs, so overriding the env var alone is not enough — update the
# already-latched config directly.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NO persistent compile cache for the XLA:CPU suite. Two fatal failure
# modes observed with it on: (1) serializing an 8-device CPU executable
# SIGABRTs inside jax's put_executable_and_time (crashed the suite at the
# sharding tests twice); (2) CPU entries embed host-specific AOT code and
# this VM migrates between machines with different CPU feature sets, so
# loading another host's entry SIGILLs (cpu_aot_loader "machine features
# don't match"). The TPU CLIs keep their persistent cache
# (utils/platform.py) — TPU executables have neither problem.


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound accumulated XLA:CPU JIT state. Large compiles late in a
    long-lived process segfault LLVM on this machine class (reproduced 4x:
    the crash always hits whichever big program compiles last — the 8-device
    sharding step, then InceptionV3 after that test was isolated). Dropping
    compiled executables between modules keeps the process young; each
    module still reuses its own compilations."""
    yield
    import jax as _jax

    _jax.clear_caches()
