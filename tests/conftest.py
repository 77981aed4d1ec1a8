"""Test configuration: run on CPU with 8 virtual devices and x64.

Multi-chip sharding is validated on a virtual CPU mesh (the driver
separately dry-runs the multi-chip path); numerical oracle tests use
float64 for tight tolerances.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the environment's TPU plugin registers itself via sitecustomize and
# overrides JAX_PLATFORMS; force the CPU backend explicitly
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
