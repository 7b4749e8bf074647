"""Persistent XLA compilation cache for serving start-up.

The reference rebuilds its ggml graph per image so it has no compile cost
to amortize; the TPU engine pays one large XLA compile per (geometry,
batch, kernel-config) program instead — minutes for the big serving
programs on a fresh process (docs/TUNING.md). JAX's persistent
compilation cache makes that a one-time cost per machine: compiled
executables are keyed by HLO fingerprint and written to a directory, and
every later process with the same program loads the binary instead of
recompiling.

Opt-in via `--compile-cache [DIR]` on the CLIs or the VIT_COMPILE_CACHE
environment variable (value = cache directory, empty = default location).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "vit_cpp_tpu", "xla"
)

_enabled_dir: str | None = None


def enable_compile_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `path` (created if
    missing). Must run before the programs of interest are compiled;
    safe to call repeatedly. Returns the cache directory in use."""
    global _enabled_dir
    import jax

    cache_dir = os.path.abspath(path or os.environ.get("VIT_COMPILE_CACHE") or DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # jax memoizes its is-the-cache-used decision at the FIRST compile of
    # the process (compilation_cache._cache_checked): if anything compiled
    # before this call — a warmup, an earlier engine — the cache would
    # silently never engage. reset_cache() drops that memo (and the
    # module-global cache object, so it reopens on cache_dir).
    try:
        from jax._src import compilation_cache

        compilation_cache.reset_cache()
    except (ImportError, AttributeError):  # private API; best-effort
        pass
    _enabled_dir = cache_dir
    return cache_dir


def enable_from_env() -> str | None:
    """Enable the cache iff VIT_COMPILE_CACHE is set (CLI entry hook)."""
    if os.environ.get("VIT_COMPILE_CACHE") is not None:
        return enable_compile_cache()
    return None
