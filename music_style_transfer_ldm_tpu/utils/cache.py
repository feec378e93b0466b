"""Persistent XLA compilation cache.

Compiles can dominate cold-start latency (minutes through remote-compile
tunnels); enabling the persistent cache makes every entry point warm-start.
Called from the CLI, bench, and serving entry points.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Returns the cache directory path (callers can probe its population
    to tell a cold cache from a warm one, e.g. bench's budget reserves)."""
    import jax
    cache_dir = cache_dir or os.environ.get(
        "MSTLDM_COMPILE_CACHE",
        str(Path.home() / ".cache" / "mstldm_xla"))
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except AttributeError:
        pass  # older jax without the knobs
    return cache_dir
