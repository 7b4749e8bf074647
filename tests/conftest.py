"""Test configuration: force CPU JAX with an 8-device virtual mesh.

Multi-chip sharding tests run on virtual CPU devices per SURVEY.md §4
(XLA_FLAGS=--xla_force_host_platform_device_count). The host environment
pins JAX_PLATFORMS=axon (one real TPU via tunnel); the env var alone is not
reliably honored once the axon plugin is importable, so we also set the jax
config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# No persistent compilation cache in the suite: jax's module-global cache
# object survives a `jax_compilation_cache_dir` reset once initialized, so
# a cache enabled by ANY test would silently serialize every later >1s
# compile into some tmp_path. (The r4 mid-suite segfault was originally
# blamed on this — the REAL cause was vm.max_map_count exhaustion, see
# _drop_jax_executables_per_module below — but keeping the suite
# cache-free stays correct for determinism.) test_compile_cache.py flips
# this on explicitly and resets the module state after itself.
jax.config.update("jax_enable_compilation_cache", False)

# Environment for CLI subprocess tests: a MINIMAL env so the axon TPU
# plugin never loads in the child (JAX_PLATFORMS=cpu alone is ignored once
# the plugin is importable, and a down TPU tunnel hangs backend init).
# Setting PYTHONPATH shadows the axon site dir — deliberate here, and only
# here (see CLAUDE.md: never set it for on-device runs).
CLI_SUBPROCESS_ENV = {
    "JAX_PLATFORMS": "cpu",
    "PATH": "/usr/bin:/bin",
    "PYTHONPATH": "/root/repo",
}


def _ensure_map_budget(minimum: int = 262144) -> None:
    """Raise vm.max_map_count for the suite (best-effort, root-only).

    Root cause of the r4/r5 mid-suite jaxlib SEGFAULT (measured, r5):
    every XLA:CPU executable's JIT code lives in LLVM ORC memory pools
    as r-xp/r--p/rw-p anonymous mappings that are NEVER unmapped for the
    process lifetime (verified: deleting the executable and
    jax.clear_caches() free zero maps). The ~540-test suite compiles
    enough programs to cross the kernel's default vm.max_map_count
    (65,530 — monitored: 65,385 maps at the crash), after which the next
    big compile's mmap fails and jaxlib segfaults — always on the first
    large mesh train-step past the budget
    (test_parallel.py::test_train_step_tp_matches_dp, ~62% into the
    suite). The r4 diagnosis (persistent-compile-cache serialization)
    was wrong; disabling the cache moved nothing. Per-module cache
    clearing cannot help (code pages don't return) — the map budget
    itself must grow. This harness runs the suite as root, so raise it
    here; if that fails, warn loudly instead of dying at 62%.
    """
    path = "/proc/sys/vm/max_map_count"
    try:
        with open(path) as f:
            current = int(f.read().strip())
        if current >= minimum:
            return
        with open(path, "w") as f:
            f.write(str(minimum))
    except OSError:
        import warnings

        warnings.warn(
            f"could not raise {path} (need >= {minimum}); the full suite "
            "accumulates ~70k JIT-code mappings and jaxlib will segfault "
            "when the kernel map budget runs out — run as root or raise "
            "the sysctl, or run the suite in <=2 chunks",
            stacklevel=1,
        )


_ensure_map_budget()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-tail tests (>15 s on the 1-core CI host); inner loop "
        "runs -m 'not slow' (~13 min), the full suite gates snapshots",
    )


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
