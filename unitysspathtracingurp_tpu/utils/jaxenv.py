"""Shared JAX process-level config for scripts/examples.

The JAX_PLATFORMS env var alone does NOT stop the tunneled-TPU plugin
from blocking at backend init when the tunnel is down — only the
config API does (bench.py and tests/conftest.py carry the same
workaround). Call :func:`setup_jax` right after ``import jax`` in any
entry-point script.
"""

from __future__ import annotations

import os


def setup_jax(compilation_cache: str | None = "/tmp/jax_bench_cache"):
    """Honor JAX_PLATFORMS via the config API and enable the
    persistent compilation cache (the fully-unrolled march compiles
    slowly; the cache makes repeat runs start in seconds)."""
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if compilation_cache:
        jax.config.update("jax_compilation_cache_dir", compilation_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
