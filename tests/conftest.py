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
# a cache enabled by ANY test would make every later >1s compile attempt an
# executable serialization — jaxlib segfaulted doing exactly that on a
# mesh train-step executable mid-suite (r4). test_compile_cache.py flips
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
