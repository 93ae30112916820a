"""ctypes binding for libnbodycore (lazy build, graceful fallback).

pybind11 isn't available in this image, so the native library exposes a plain
C ABI and is loaded with ctypes. The shared object is built on demand with
g++ (one translation unit, no build system needed — the reference is likewise
a single nvcc invocation, /root/reference/cudaCmd.txt:1); if no compiler is
present, callers fall back to the pure-Python implementations.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "nbodycore.cpp")
_LIB = os.path.join(_DIR, "libnbodycore.so")
_ABI_VERSION = 1

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    gxx = shutil.which("g++") or shutil.which("c++")
    if gxx is None:
        return False
    tmp = _LIB + ".tmp.so"
    cmd = [gxx, "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build() and not os.path.exists(_LIB):
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        if lib.nbx_abi_version() != _ABI_VERSION:
            return None
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.nbx_ival64_sequence.argtypes = [ctypes.c_uint64, ctypes.c_int64,
                                            u64p]
        lib.nbx_scene_fill.argtypes = [
            ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            f32p, f32p, f32p, f32p]
        lib.nbx_write_pgm.argtypes = [ctypes.c_char_p, u8p, ctypes.c_int32,
                                      ctypes.c_int32]
        lib.nbx_write_pgm.restype = ctypes.c_int32
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def ival64_sequence(seed: int, n: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    out = np.empty(n, np.uint64)
    lib.nbx_ival64_sequence(seed, n, out)
    return out


def scene_arrays(seed: int, n: int, field_width: int, field_height: int,
                 min_mass: float, max_mass: float,
                 min_radius: float, max_radius: float):
    lib = _load()
    assert lib is not None
    pos = np.empty((n, 2), np.float32)
    vel = np.empty((n, 2), np.float32)
    mass = np.empty(n, np.float32)
    radius = np.empty(n, np.float32)
    lib.nbx_scene_fill(seed, n, field_width, field_height,
                       np.float32(min_mass), np.float32(max_mass),
                       np.float32(min_radius), np.float32(max_radius),
                       pos.reshape(-1), vel.reshape(-1), mass, radius)
    return pos, vel, mass, radius


def write_pgm(path: str, img: np.ndarray) -> bool:
    """Native P5 writer; returns False if the library is unavailable or IO
    failed (caller falls back to the Python writer)."""
    lib = _load()
    if lib is None:
        return False
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape
    return lib.nbx_write_pgm(path.encode(), img.reshape(-1), w, h) == 0
