"""Persistent XLA compilation + lowering-artifact caches for entrypoints.

On tunnelled TPU backends, compiling the demod scan can take seconds on a
good day and tens of minutes on a bad one (measured; see BENCHMARKS.md
"backend variance").  The streaming Receiver's shape buckets mean a cold
ground station pays a handful of such compiles at startup — so every CLI
entrypoint enables JAX's persistent compilation cache: a restarted
receiver (systemd Restart=always, the reference's supervision model)
reloads its programs from disk instead of recompiling.

Separately, `jit.lower()` of a LARGE program is itself stochastic on the
tunnelled axon platform (measured 2026-08-21: 1.2 s and 282 s for the
identical program; CPU-platform lowering of the same program is 0.9 s),
so `export_cached_jit` additionally caches the platform-lowered
`jax.export` artifact on disk: a fresh process deserializes in
milliseconds and goes straight to the XLA-cache executable load.
Artifacts are keyed by shape signature + device platform + a fingerprint
of the package sources, so code edits self-invalidate them.
"""
from __future__ import annotations

import hashlib
import os
import threading

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "wenet_tpu_xla")
_ACTIVE_DIR: str | None = None
_FINGERPRINT: str | None = None


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache (idempotent, best-effort).

    Env override: WENET_JAX_CACHE (set to "0"/"off" to disable).
    Returns the cache dir, or None if disabled/unavailable.
    """
    global _ACTIVE_DIR
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
        _ACTIVE_DIR = path
        return path
    except Exception:            # pragma: no cover - old jax / RO filesystem
        return None


def cache_dir() -> str | None:
    """The active persistent-cache dir (None until enabled)."""
    return _ACTIVE_DIR


def source_fingerprint(extra_files: tuple = ()) -> str:
    """Short content hash over the wenet_tpu sources (+ extra files):
    part of every export-artifact key so a code edit can never silently
    load a stale lowered program."""
    global _FINGERPRINT
    if _FINGERPRINT is not None and not extra_files:
        return _FINGERPRINT
    h = hashlib.sha1()
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = []
    for root, _, files in os.walk(pkg):
        paths.extend(os.path.join(root, f) for f in files
                     if f.endswith(".py"))
    for p in sorted(paths) + sorted(extra_files):
        try:
            with open(p, "rb") as f:
                h.update(p.encode())
                h.update(f.read())
        except OSError:
            pass
    fp = h.hexdigest()[:12]
    if not extra_files:
        _FINGERPRINT = fp
    return fp


class _ExportCachedJit:
    """Wrap a jitted function with an on-disk cache of its lowering.

    First call: if an artifact for (key, platform, source fingerprint)
    exists, deserialize it (milliseconds) and dispatch through it —
    skipping the big-program lowering lottery entirely.  Otherwise run
    the wrapped function normally and write the artifact from a daemon
    thread afterwards (the export pays its own lowering spin; if the
    backend wedges it, the thread hangs harmlessly and no artifact is
    written).  Pass-through when no persistent cache dir is active.
    """

    def __init__(self, fn, key: str):
        self.fn = fn
        self.key = key
        self._call = None
        self._lock = threading.Lock()

    def _path(self):
        if _ACTIVE_DIR is None:
            return None
        import jax
        plat = jax.devices()[0].platform
        return os.path.join(
            _ACTIVE_DIR,
            f"exp_{self.key}_{plat}_{source_fingerprint()}.jaxexp")

    def _write_artifact(self, path, args):
        try:
            import jax
            data = jax.export.export(self.fn)(*args).serialize()
            # process-unique temp name: concurrent writers (e.g. parallel
            # good_window_bench pounces) must not interleave into one .tmp
            tmp = f"{path}.{os.getpid()}.tmp"
            with open(tmp, "wb") as f:
                f.write(bytes(data))
            os.replace(tmp, path)
        except Exception:
            pass

    def __call__(self, *args):
        with self._lock:
            if self._call is None:
                path = self._path()
                if path is None:
                    self._call = self.fn
                elif os.path.exists(path):
                    try:
                        import jax
                        exp = jax.export.deserialize(
                            bytearray(open(path, "rb").read()))
                        self._call = jax.jit(exp.call)
                    except Exception:
                        # a corrupt artifact (torn write) would otherwise
                        # disable the lowering cache for this key forever:
                        # drop it so the next miss rewrites a good one
                        try:
                            os.remove(path)
                        except OSError:
                            pass
                        self._call = self.fn
                else:
                    self._call = self.fn
                    out = self.fn(*args)   # normal first call (may compile)
                    threading.Thread(target=self._write_artifact,
                                     args=(path, args), daemon=True).start()
                    return out
            call = self._call
        if call is self.fn:
            return call(*args)
        try:
            return call(*args)
        except Exception:
            # exports are shape/platform-specialized; an off-artifact call
            # (e.g. a different shape bucket) falls back to the pristine
            # jitted fn, which re-raises any real error
            with self._lock:
                self._call = self.fn
            return self.fn(*args)


def export_cached_jit(fn, key: str):
    """Wrap an already-jitted `fn` in the lowering-artifact disk cache."""
    return _ExportCachedJit(fn, key)
