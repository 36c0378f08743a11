"""Test configuration: run everything on a virtual 8-device CPU mesh with x64
enabled, so numerics are validated in double precision and the distributed
layer is testable without TPU hardware (SURVEY.md §4e)."""

import os

# The shell pre-sets JAX_PLATFORMS=axon (TPU tunnel); tests must run on the
# host CPU mesh, so override unless the user explicitly asks otherwise.
os.environ["JAX_PLATFORMS"] = os.environ.get("LFVIO_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
