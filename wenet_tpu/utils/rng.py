"""PRNG key construction without int64 device traffic.

`jax.random.PRNGKey` routes the seed through an int64 host->device
conversion, which some TPU backends (notably the tunnelled axon PJRT
plugin) do not implement.  Legacy threefry keys are just uint32[2] arrays,
so build them directly."""
from __future__ import annotations

import jax.numpy as jnp


def prng_key(seed: int) -> jnp.ndarray:
    """uint32[2] threefry key equal to jax.random.PRNGKey(seed)."""
    seed = int(seed)
    return jnp.array([(seed >> 32) & 0xFFFFFFFF, seed & 0xFFFFFFFF],
                     dtype=jnp.uint32)
