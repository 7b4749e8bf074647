"""Test configuration: force CPU JAX with an 8-device virtual mesh.

Multi-chip sharding tests run on virtual CPU devices per SURVEY.md §4
(XLA_FLAGS=--xla_force_host_platform_device_count). Must run before the
first `import jax` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
