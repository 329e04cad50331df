"""Native (C++) host-side runtime components.

Currently: the NL-Drive .bin loader (`loader.cc`) — mmap'd reads + uniform
sampling + a thread pool, replacing the reference's torch DataLoader worker
processes.  Built on first use with g++ (no pybind11; plain ctypes ABI),
falling back to the pure-numpy loader when no toolchain is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cc")
_SO = os.path.join(_HERE, "_loader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.nld_load_and_sample.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.nld_load_and_sample.restype = ctypes.c_int
        lib.nld_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
        ]
        lib.nld_load_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def load_and_sample(path: str, num_points: int, seed: int) -> np.ndarray:
    """(num_points, 3) float32 sample of one .bin file."""
    lib = get_lib()
    assert lib is not None, "native loader unavailable"
    out = np.empty((num_points, 3), np.float32)
    rc = lib.nld_load_and_sample(
        path.encode(), num_points, ctypes.c_uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc < 0:
        raise IOError(f"native loader failed ({rc}) for {path}")
    return out


def load_batch(
    paths: List[str], num_points: int, seed: int, n_threads: int = 4
) -> np.ndarray:
    """(len(paths), num_points, 3) float32 samples, loaded by a thread pool."""
    lib = get_lib()
    assert lib is not None, "native loader unavailable"
    count = len(paths)
    out = np.empty((count, num_points, 3), np.float32)
    status = np.empty((count,), np.int32)
    arr = (ctypes.c_char_p * count)(*[p.encode() for p in paths])
    rc = lib.nld_load_batch(
        arr, count, num_points, ctypes.c_uint64(seed), n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if rc < 0:
        bad = [paths[i] for i in range(count) if status[i] < 0]
        raise IOError(f"native loader failed ({rc}) for {bad[:3]}")
    return out
