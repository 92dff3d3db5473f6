"""Native C++ runtime loader.

Builds (once, cached) and loads the C++ runtime shared library providing the
async IO job queue, the BGEO serializer, and weighted sample elimination —
the host-side subsystems the reference implements in C++
(Library/MnSystem/IO/*).  Falls back to ``None`` when no compiler is
available; Python implementations cover every entry point.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "runtime.cpp")
_LIB = os.path.join(_HERE, "libcm_runtime.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=240,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native runtime, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            # stale/ABI-incompatible binary (e.g. restored without mtimes):
            # rebuild from source once before giving up
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_LIB)
            except OSError:
                return None
        lib.cm_write_bgeo.restype = ctypes.c_int
        lib.cm_write_bgeo.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ]
        lib.cm_async_write_bgeo.restype = ctypes.c_int
        lib.cm_async_write_bgeo.argtypes = lib.cm_write_bgeo.argtypes
        lib.cm_flush.restype = None
        lib.cm_flush.argtypes = []
        lib.cm_sample_elimination.restype = ctypes.c_int
        lib.cm_sample_elimination.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def write_bgeo_native(path: str, positions, attributes=None,
                      asynchronous: bool = False) -> bool:
    """BGEO write through the C++ runtime.  Returns False if unavailable."""
    import numpy as np

    lib = load()
    if lib is None:
        return False
    attributes = attributes or {}
    pos = np.ascontiguousarray(positions, np.float32)
    n = pos.shape[0]
    names, widths, bufs = [], [], []
    for k, v in attributes.items():
        v = np.ascontiguousarray(v, np.float32)
        if v.ndim == 1:
            v = v[:, None]
        names.append(k.encode())
        widths.append(v.shape[1])
        bufs.append(v)
    n_attrs = len(names)
    name_arr = (ctypes.c_char_p * max(n_attrs, 1))(*names)
    width_arr = (ctypes.c_int * max(n_attrs, 1))(*widths)
    ptr_arr = (ctypes.POINTER(ctypes.c_float) * max(n_attrs, 1))(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for b in bufs]
    )
    fn = lib.cm_async_write_bgeo if asynchronous else lib.cm_write_bgeo
    rc = fn(
        path.encode(), n, pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_attrs, name_arr, width_arr, ptr_arr,
    )
    return rc == 0


def flush_native() -> None:
    lib = load()
    if lib is not None:
        lib.cm_flush()


def sample_elimination_native(points, target: int):
    """Weighted sample elimination; returns kept indices or None."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    lo = pts.min(axis=0)
    pts0 = pts - lo
    ext = np.maximum(pts0.max(axis=0), 1e-6)
    out = np.zeros(max(target, 1), np.int32)
    k = lib.cm_sample_elimination(
        pts0.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, target,
        float(ext[0]), float(ext[1]), float(ext[2]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out[:k]
