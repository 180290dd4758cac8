"""Test configuration: force CPU JAX with 8 virtual devices so multi-chip
sharding tests run anywhere (the driver validates the real multi-chip path
separately via __graft_entry__.dryrun_multichip).

NOTE: this environment's axon sitecustomize pins jax_platforms at interpreter
start, so the env var alone is not enough — the config must be updated before
any backend initialization.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

# No persistent JAX compilation cache under pytest: serializing
# executables (esp. ones compiled for non-default virtual devices in the
# multichip dryrun) can segfault the cache writer, and CPU compiles are
# fast enough without it.  "" disables the decoder's opt-in.
os.environ["VVDEC_JAX_CACHE"] = ""
try:
    jax.config.update("jax_compilation_cache_dir", None)
except Exception:
    pass


import pytest


@pytest.fixture(autouse=True, scope="module")
def _bounded_jax_cache():
    """Free compiled executables between test modules: the suite
    accumulates hundreds of jitted programs (every lru_cached kernel
    class x shape), and XLA:CPU compiles can abort/segfault once the
    long-lived process is memory-heavy.  Recompiles are cheap on CPU."""
    yield
    try:
        jax.clear_caches()
    except Exception:
        pass
