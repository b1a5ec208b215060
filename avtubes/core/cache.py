"""Persistent XLA compilation cache.

TPU compiles of the full train/eval programs run 30-500 s in this
environment; enabling jax's persistent cache makes second processes (the
bench driver, repeated CLI invocations) start warm.  Call once, early.
"""

from __future__ import annotations

import os


def _version_tag() -> str:
    """Fingerprint of the compiler stack WITHOUT initializing any backend.

    AOT executables serialized by one libtpu build fail FAILED_PRECONDITION
    when deserialized against another (rolling upgrades mid-flight), so the
    cache directory is scoped to the installed jax/jaxlib/libtpu versions —
    a new build simply starts a fresh cache instead of crashing.
    """
    import jax

    parts = [f"jax-{jax.__version__}"]
    try:
        from importlib.metadata import version

        for pkg in ("jaxlib", "libtpu", "libtpu-nightly"):
            try:
                parts.append(f"{pkg}-{version(pkg)}")
            except Exception:
                pass
    except Exception:
        pass
    # XLA:CPU AOT executables also bake in host machine features; a cache
    # shared across heterogeneous hosts (same package versions, different
    # CPUs) loads with "machine type doesn't match" / SIGILL risk.  Scope
    # the cache per CPU feature set.
    try:
        import hashlib

        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    parts.append("cpu-" + hashlib.sha1(line.encode()).hexdigest()[:10])
                    break
    except Exception:
        pass
    return "_".join(parts)


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    base = path or os.environ.get("AVTUBES_JAX_CACHE", "/tmp/avtubes_jax_cache")
    cache_dir = os.path.join(base, _version_tag())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # re-set the enable flag: a prior disable_compilation_cache() in the
        # same process (e.g. a hermetic dryrun) turns it off globally
        jax.config.update("jax_enable_compilation_cache", True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception as e:  # cache support varies by backend; never fatal
        print(f"[cache] persistent compilation cache unavailable: {e}")


def disable_compilation_cache() -> None:
    """Turn the persistent cache off (hermetic runs, e.g. multichip dryrun).

    Flipping the config flags alone is NOT enough once the cache has been
    initialized by an earlier enable in the same process — jax holds on to
    the initialized cache object and keeps serving reads from it (verified:
    entry() then dryrun still loaded stale XLA:CPU AOT artifacts).  The
    initialized object must be dropped via reset_cache() as well.
    """
    import jax

    for key, val in (("jax_enable_compilation_cache", False),
                     ("jax_compilation_cache_dir", None)):
        try:
            jax.config.update(key, val)
        except Exception:
            pass
    try:  # drop an already-initialized cache object (private, so guarded)
        from jax._src import compilation_cache

        compilation_cache.reset_cache()
    except Exception:
        pass
