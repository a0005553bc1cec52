"""Test configuration.

Tests run on CPU with 8 virtual devices so `jax.sharding` / `shard_map`
multi-chip paths can be exercised without TPU hardware.  Must be set before
JAX initialises its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's TPU plugin (sitecustomize) force-sets
# jax.config.jax_platforms at interpreter start, overriding the env var —
# pin it back to cpu before any backend initialises.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
