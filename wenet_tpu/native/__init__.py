"""Native host-side runtime: C implementations of the sequential/streaming
pieces (UW acquisition FSM, sample-format conversion), built on demand with
the system compiler and bound via ctypes.  Falls back gracefully — callers
check `available()` and keep their numpy paths."""
from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(__file__)
_LIB = None
_TRIED = False


def _build_dir() -> str:
    d = os.environ.get("WENET_TPU_NATIVE_DIR",
                       os.path.join(tempfile.gettempdir(), "wenet_tpu_native"))
    os.makedirs(d, exist_ok=True)
    return d


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        return None
    src = os.path.join(_HERE, "deframe_fsm.c")
    out = os.path.join(_build_dir(), "libwenet_native.so")
    try:
        if (not os.path.exists(out) or
                os.path.getmtime(out) < os.path.getmtime(src)):
            subprocess.run([cc, "-O3", "-shared", "-fPIC", src, "-o", out],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(out)
    except (OSError, subprocess.CalledProcessError):
        return None
    from numpy.ctypeslib import ndpointer
    lib.uw_detect.restype = ctypes.c_long
    lib.uw_detect.argtypes = [
        ndpointer(ctypes.c_float, flags="C_CONTIGUOUS"), ctypes.c_long,
        ndpointer(ctypes.c_uint8, flags="C_CONTIGUOUS"), ctypes.c_int,
        ctypes.c_int, ctypes.c_long,
        ndpointer(ctypes.c_int8, flags="C_CONTIGUOUS"),
        ndpointer(ctypes.c_int64, flags="C_CONTIGUOUS"), ctypes.c_long,
        ndpointer(ctypes.c_int8, flags="C_CONTIGUOUS")]
    lib.cu8_to_c64.restype = None
    lib.cu8_to_c64.argtypes = [
        ndpointer(ctypes.c_uint8, flags="C_CONTIGUOUS"), ctypes.c_long,
        ndpointer(ctypes.c_float, flags="C_CONTIGUOUS")]
    lib.cs16_to_c64.restype = None
    lib.cs16_to_c64.argtypes = [
        ndpointer(ctypes.c_int16, flags="C_CONTIGUOUS"), ctypes.c_long,
        ndpointer(ctypes.c_float, flags="C_CONTIGUOUS")]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def uw_detect(soft: np.ndarray, uw: np.ndarray, allowed: int, syms: int,
              init_buffer: np.ndarray):
    """C acquisition FSM; returns (positions int64[], final_buffer int8[])."""
    lib = _load()
    soft = np.ascontiguousarray(soft, np.float32)
    uw = np.ascontiguousarray(uw, np.uint8)
    init = np.ascontiguousarray(init_buffer, np.int8)
    max_out = max(len(soft) // (syms + 1) + 2, 16)
    out = np.zeros(max_out, np.int64)
    final = np.zeros(len(uw), np.int8)
    n = lib.uw_detect(soft, len(soft), uw, len(uw), allowed, syms, init,
                      out, max_out, final)
    return out[:n].copy(), final


def cu8_to_c64(raw: np.ndarray) -> np.ndarray:
    lib = _load()
    raw = np.ascontiguousarray(raw, np.uint8)
    out = np.empty(len(raw) // 2 * 2, np.float32)
    lib.cu8_to_c64(raw, len(raw) // 2, out)
    return out.view(np.complex64)


def cs16_to_c64(raw: np.ndarray) -> np.ndarray:
    lib = _load()
    raw = np.ascontiguousarray(raw, np.int16)
    out = np.empty(len(raw) // 2 * 2, np.float32)
    lib.cs16_to_c64(raw, len(raw) // 2, out)
    return out.view(np.complex64)
