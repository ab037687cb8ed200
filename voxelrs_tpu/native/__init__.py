"""Native (C++) runtime components, loaded via ctypes with build-on-demand.

The reference implements its hot host paths (chunk octree construction +
ESVO serialization) in Rust; here they are C++ compiled to a shared object
the first time they're needed. Every native function has a numpy fallback —
`serialize_dense_chunk` — and the test suite asserts byte-identical output.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "esvo_native.cpp")
_SO = os.path.join(_HERE, "_esvo_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # missing toolchain → numpy fallback
        print(f"native build failed ({e}); using numpy serializer")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.esvo_serialize_chunk.restype = ctypes.c_uint32
            lib.esvo_serialize_chunk.argtypes = [
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_uint32,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            _lib = lib
        except OSError as e:
            print(f"native load failed ({e}); using numpy serializer")
            _failed = True
    return _lib


def serialize_chunk_native(voxels: np.ndarray, lod: int):
    """Native ESVO chunk serialization; returns (buffer, (cm, lm, depth)) or
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    vox = np.ascontiguousarray(voxels, dtype=np.uint32)
    # worst case: every voxel present => sum_{l=0..4} 8^l blocks * 12 words
    cap = 4681 * 12 + 16
    out = np.empty(cap, np.uint32)
    meta = np.zeros(3, np.uint8)
    n = lib.esvo_serialize_chunk(
        vox.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        int(lod),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        cap,
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if n == 0xFFFFFFFF:
        return None  # overflow — let the numpy path handle it
    return out[:n].copy(), (int(meta[0]), int(meta[1]), int(meta[2]))
