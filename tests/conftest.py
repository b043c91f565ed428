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

# CPU compiles of the 3-D conv stacks are slow; cache them across runs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
