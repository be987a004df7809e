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


def make_hybrid_mesh(tp: int = 1, axes=("batch", "model")) -> Mesh:
    """DCN x ICI-aware 2-D mesh for multi-host pod slices.

    The model (tensor-parallel) axis must ride ICI — its per-BP-iteration
    psums are latency-critical — while the batch axis tolerates DCN. On
    multi-process runs this uses mesh_utils.create_hybrid_device_mesh with
    tp packed innermost (within a host's slice); single-process runs fall
    back to a local reshape with the same axis semantics, so programs
    written against this mesh run unchanged from laptop to pod.
    """
    n = len(jax.devices())
    if n % tp:
        raise ValueError(f"tp={tp} does not divide {n} devices")
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils
        per_host = n // jax.process_count()
        if per_host % tp == 0:
            try:
                devs = mesh_utils.create_hybrid_device_mesh(
                    (per_host // tp, tp), (jax.process_count(), 1))
                return Mesh(devs.reshape(n // tp, tp), axes)
            except ValueError:
                # no slice topology metadata (e.g. multi-process CPU, some
                # single-slice configurations): jax.devices() is ordered by
                # process, so the plain reshape below still keeps each tp
                # group within one process's devices — the ICI-local
                # property the hybrid mesh exists for
                pass
    return Mesh(np.array(jax.devices()).reshape(n // tp, tp), axes)


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Multi-host bring-up (`jax.distributed.initialize`) for pod-slice
    sweeps: capture batches and Monte-Carlo points are sharded over the
    global mesh (psum counters ride ICI within a slice, DCN across hosts).
    On single-host systems this is a no-op.  Returns the process count."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_count()
