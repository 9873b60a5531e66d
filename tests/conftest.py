"""Test config: run JAX on a virtual 8-device CPU mesh.

This environment's sitecustomize force-registers the axon TPU backend and
sets ``jax_platforms=axon,cpu`` at interpreter startup, overriding the
JAX_PLATFORMS env var — so we must override the *config* after import (before
first backend use).  XLA_FLAGS still must be set before backend init.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
