"""Test environment: force an 8-device virtual CPU mesh.

Multi-chip sharding paths (pjit / shard_map over a Mesh) are validated on a
virtual 8-device CPU platform; real-TPU benchmarks run separately via bench.py.
Must set XLA flags before jax initializes.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the real TPU tunnel), so a
# plain env override is not enough — force the platform via jax.config too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
