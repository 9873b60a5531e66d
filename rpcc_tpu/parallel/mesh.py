"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def data_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the first ``num_devices`` devices, axis name 'data'."""
    devs = jax.devices()
    n = len(devs) if num_devices is None else num_devices
    return Mesh(np.asarray(devs[:n]), ("data",))
