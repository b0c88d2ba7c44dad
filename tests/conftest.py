"""Test configuration: run on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend and forces
``jax_platforms='axon,cpu'`` regardless of the JAX_PLATFORMS env var, so we
switch back to CPU through jax.config after import (before any device use)
and request 8 virtual host devices for sharding tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
