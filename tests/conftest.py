"""Test configuration: run everything on a virtual 8-device CPU mesh with x64
enabled, so numerics are validated in double precision and the distributed
layer is testable without TPU hardware (SURVEY.md §4e)."""

import os
import sys

# JAX tracing (Pallas kernels especially) uses deep interpreter stacks;
# pytest's own frames push past the default 1000 limit.
sys.setrecursionlimit(5000)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The shell pre-sets JAX_PLATFORMS=axon (TPU tunnel), and the env var alone
# does not reliably override the plugin — use the config API.
_platform = os.environ.get("LFVIO_TEST_PLATFORM", "cpu")
jax.config.update("jax_platforms", _platform)
# x64 on the CPU mesh validates numerics in double precision; on the real
# TPU the operating point is f32 (and x64 tracing of Pallas kernels hits a
# JAX-internal recursion, so it must stay off there).
jax.config.update("jax_enable_x64", _platform == "cpu")
