"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run anywhere (the real TPU is reserved for bench.py).

Note: the environment's sitecustomize force-registers the axon TPU backend
and sets jax_platforms="axon,cpu" *after* env vars are read, so the
JAX_PLATFORMS env var alone is not enough — override the config directly
before any backend is initialised.
"""
import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))
