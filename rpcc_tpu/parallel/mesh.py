"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def data_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the first ``num_devices`` devices, axis name 'data'.

    Raises when the request cannot be met — silently truncating to the
    available devices would let a caller that sizes batches by the
    requested count run at a fraction of the intended parallelism, and an
    empty mesh only fails later with an opaque XLA sharding error."""
    devs = jax.devices()
    n = len(devs) if num_devices is None else num_devices
    if n < 1:
        raise ValueError(f"data_mesh needs >= 1 device, got {num_devices}")
    if n > len(devs):
        raise ValueError(
            f"data_mesh({num_devices}) but only {len(devs)} device(s) visible "
            f"({[str(d) for d in devs[:4]]}...) — set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={num_devices} on CPU"
        )
    return Mesh(np.asarray(devs[:n]), ("data",))
