"""Test configuration: force an 8-device virtual CPU mesh + fp64.

The container's sitecustomize registers the axon TPU backend and forces
``JAX_PLATFORMS=axon``; tests must run on CPU (fp64 for parity with the
fp64 Fortran reference, 8 virtual devices for sharding tests), so we
override the platform in-process *before* any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
