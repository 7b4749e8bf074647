"""Persistent XLA compilation cache (utils/compile_cache.py).

The serving feature the reference cannot have (it rebuilds its graph per
image): compiled programs persist across processes so an engine restart
skips the multi-minute first compile. Verified end-to-end on the CPU test
backend — the cache is backend-generic (keyed on HLO fingerprint).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np


def test_enable_writes_cache_entries(tmp_path, monkeypatch):
    d = str(tmp_path / "xla-cache")
    from vit_cpp_tpu.utils.compile_cache import enable_compile_cache

    got = enable_compile_cache(d)
    assert got == os.path.abspath(d) and os.path.isdir(d)
    old_t = jax.config.jax_persistent_cache_min_compile_time_secs
    old_b = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        # conftest disables the cache suite-wide (jax's module-global
        # cache object would otherwise survive the config reset and turn
        # every later slow compile into an executable serialization —
        # jaxlib segfaulted doing that mid-suite, r4); enable just here
        jax.config.update("jax_enable_compilation_cache", True)
        # drop the persistence thresholds so this tiny program qualifies
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x) @ x

        np.asarray(f(jnp.ones((64, 64), jnp.float32)))
        assert os.listdir(d), "no cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_enable_compilation_cache", False)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", old_t)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", old_b)
        from jax._src import compilation_cache

        compilation_cache.reset_cache()  # drop the module-global cache


def test_env_hook(tmp_path, monkeypatch):
    d = str(tmp_path / "env-cache")
    from vit_cpp_tpu.utils import compile_cache

    monkeypatch.delenv("VIT_COMPILE_CACHE", raising=False)
    assert compile_cache.enable_from_env() is None
    monkeypatch.setenv("VIT_COMPILE_CACHE", d)
    try:
        assert compile_cache.enable_from_env() == os.path.abspath(d)
        assert os.path.isdir(d)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        from jax._src import compilation_cache

        compilation_cache.reset_cache()
