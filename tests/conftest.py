"""Test config: force CPU with 8 virtual devices BEFORE jax backend init.

The TPU-native analog of "test multi-node without a cluster" (SURVEY.md §4):
sharding tests run on a simulated 8-device host mesh. The environment may
export ``JAX_PLATFORMS=axon`` (a tunneled TPU); tests must not depend on it,
so we override to CPU via jax.config (env vars alone are not honored once the
axon plugin is registered).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
