"""Test configuration: run everything on a virtual 8-device CPU mesh with x64
enabled, so numerics are validated in double precision and the distributed
layer is testable without TPU hardware (SURVEY.md §4e)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The shell pre-sets JAX_PLATFORMS=axon (TPU tunnel), and the env var alone
# does not reliably override the plugin — use the config API.
jax.config.update("jax_platforms", os.environ.get("LFVIO_TEST_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)
