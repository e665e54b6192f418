"""Test configuration.

Tests run on CPU with a virtual 8-device mesh (for sharding tests) and
float64 enabled, so numerical checks can use tight tolerances. The real
TPU path is exercised by bench.py and __graft_entry__.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS env; the config update works.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
