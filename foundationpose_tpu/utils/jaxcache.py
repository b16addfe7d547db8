"""Persistent XLA compilation cache setup for CLI entry points.

First-compile of the fused register/track programs takes tens of seconds on
TPU (and minutes on a small CPU host); the persistent cache makes every CLI
invocation after the first start in milliseconds. Library users who manage
their own jax config are unaffected — only the ``apps/`` mains call this.

Override the location with ``FPTPU_JAX_CACHE``; disable with
``FPTPU_JAX_CACHE=0``.
"""

from __future__ import annotations

import logging
import os


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at a persistent compilation cache directory. Returns the
    directory used, or None when disabled or when jax refuses the config
    (e.g. a backend was already initialized with different settings)."""
    cache_dir = cache_dir or os.environ.get("FPTPU_JAX_CACHE")
    if cache_dir == "0":
        return None
    if not cache_dir:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "foundationpose_tpu", "jax"
        )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception as e:  # never break an app over a cache
        logging.warning("persistent jax cache unavailable: %s", e)
        return None
    return cache_dir
