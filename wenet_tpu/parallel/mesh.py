"""Mesh construction helpers."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    """1-D data-parallel mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(dp: int, tp: int, axes=("batch", "model")) -> Mesh:
    """2-D mesh: data-parallel x tensor-parallel (for sharded BP decode)."""
    devs = np.array(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, axes)
