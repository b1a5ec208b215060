"""Persistent XLA compilation cache.

TPU compiles of the full train/eval programs run 30-500 s in this
environment; enabling jax's persistent cache makes second processes (the
bench driver, repeated CLI invocations) start warm.  Call once, early.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("AVTUBES_JAX_CACHE", "/tmp/avtubes_jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception as e:  # cache support varies by backend; never fatal
        print(f"[cache] persistent compilation cache unavailable: {e}")
