"""Test configuration.

Tests run on CPU with 8 virtual devices so `jax.sharding` / `shard_map`
multi-chip paths can be exercised without TPU hardware.  Must be set before
JAX initialises its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
