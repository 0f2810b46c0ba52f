"""Persistent XLA compilation cache.

The fused Pallas kernels and long-scan programs have multi-minute one-time
compiles; caching them on disk makes every subsequent process start warm.
Call :func:`enable_compilation_cache` early (the CLIs and bench.py do).
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "TFO_COMPILATION_CACHE", os.path.expanduser("~/.cache/twoforone_tpu_xla")
        )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return cache_dir
