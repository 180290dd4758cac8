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
