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

_lock = threading.Lock()
_libs: dict = {}


def _build(src: str, so: str) -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # missing toolchain → numpy fallback
        print(f"native build failed ({e}); using numpy serializer")
        return False


def _get(name: str, configure) -> Optional[ctypes.CDLL]:
    """Load (building on demand) the shared object for ``name``
    (<name>.cpp -> _<name>.so); ``configure(lib)`` declares prototypes."""
    if name in _libs:
        return _libs[name]
    with _lock:
        if name in _libs:
            return _libs[name]
        src = os.path.join(_HERE, f"{name}.cpp")
        so = os.path.join(_HERE, f"_{name}.so")
        lib = None
        if (os.path.exists(so)
                and os.path.getmtime(so) >= os.path.getmtime(src)) \
                or _build(src, so):
            try:
                lib = ctypes.CDLL(so)
                configure(lib)
            except OSError as e:
                print(f"native load failed ({e}); using numpy serializer")
                lib = None
        _libs[name] = lib
    return lib


def _cfg_esvo(lib):
    lib.esvo_serialize_chunk.restype = ctypes.c_uint32
    lib.esvo_serialize_chunk.argtypes = [
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint8),
    ]


def _cfg_csvo(lib):
    lib.csvo_serialize_chunk.restype = ctypes.c_uint32
    lib.csvo_serialize_chunk.argtypes = [
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint8),
    ]


def get_lib() -> Optional[ctypes.CDLL]:
    return _get("esvo_native", _cfg_esvo)


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


def serialize_csvo_native(voxels: np.ndarray, lod: int):
    """Native CSVO chunk serialization; returns (node_bytes u8 array,
    materials list[int], effective_cut) with node_bytes None for an empty
    chunk, or None when the native library is unavailable/overflowed."""
    lib = _get("csvo_native", _cfg_csvo)
    if lib is None:
        return None
    vox = np.ascontiguousarray(voxels, dtype=np.uint32)
    # worst case: full chunk => 4681 internal/leaf nodes; internal nodes
    # pay <= 2 + 8*4 bytes, leaves 1 — 64K is comfortably above
    node_cap = 1 << 17
    out = np.empty(node_cap, np.uint8)
    mats = np.empty(32768, np.uint32)
    mat_len = np.zeros(1, np.uint32)
    cut = np.zeros(1, np.uint8)
    n = lib.csvo_serialize_chunk(
        vox.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        int(lod),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        node_cap,
        mats.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        32768,
        mat_len.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        cut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if n == 0xFFFFFFFF:
        return None  # overflow — numpy path handles it
    if n == 0:
        return None, None, int(cut[0])
    return out[:n].copy(), mats[: int(mat_len[0])].copy(), int(cut[0])
