"""Test configuration: force CPU with an 8-device virtual mesh.

Tests must run without TPU hardware; multi-device sharding tests use
XLA's host-platform device multiplication.
"""

import os

# Force CPU even when the environment points JAX at a (tunneled) TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

# The container's sitecustomize imports jax before conftest runs, freezing
# jax_platforms to the tunneled TPU backend; override via config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
