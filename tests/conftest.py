"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

The axon TPU plugin ignores the JAX_PLATFORMS env var, so we must set the
platform via jax.config *before any backend is initialized* — conftest import
time is the only reliable place.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
