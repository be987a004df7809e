"""Persistent XLA compilation cache for operator entrypoints.

On tunnelled TPU backends, compiling the demod scan can take seconds on a
good day and tens of minutes on a bad one (measured; see BENCHMARKS.md
"backend variance").  The streaming Receiver's shape buckets mean a cold
ground station pays a handful of such compiles at startup — so every CLI
entrypoint enables JAX's persistent compilation cache: a restarted
receiver (systemd Restart=always, the reference's supervision model)
reloads its programs from disk instead of recompiling.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "wenet_tpu_xla")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache (idempotent, best-effort).

    Env override: WENET_JAX_CACHE (set to "0"/"off" to disable).
    Returns the cache dir, or None if disabled/unavailable.
    """
    env = os.environ.get("WENET_JAX_CACHE", "")
    if env.lower() in ("0", "off", "none"):
        return None
    path = path or env or _DEFAULT
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return path
    except Exception:            # pragma: no cover - old jax / RO filesystem
        return None
