"""Test config: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax initializes (first import).  This mirrors the
driver's multi-chip dry-run environment and keeps tests hermetic/fast.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
