"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's CI strategy of exercising all parallelism in one
process (SURVEY.md §4.7): multi-chip sharding paths are validated on a
virtual CPU device mesh via --xla_force_host_platform_device_count.

Note: this image boots an `axon` TPU PJRT plugin via sitecustomize and
forces jax_platforms programmatically, so the env var alone is not enough —
we override the config after import (the supported escape hatch).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
