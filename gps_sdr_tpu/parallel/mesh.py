"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


AXIS = "dev"


def make_mesh(n_devices: Optional[int] = None, axis: str = AXIS) -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
