"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-standard substitute for multi-chip hardware (the driver
separately dry-runs the multi-chip path); it also keeps unit tests off the
single shared TPU chip. NOTE: this environment's sitecustomize registers the
axon TPU plugin and sets ``jax_platforms=axon,cpu`` programmatically, so the
JAX_PLATFORMS env var alone is not enough — we must override the config after
import (before any backend is initialized).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the 2-CPU host compiles slowly, and test
# programs have stable shapes — cache across pytest runs
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
