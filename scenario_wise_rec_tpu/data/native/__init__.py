"""ctypes bindings for the native columnar CSV parser (fastcsv.cpp).

``read_csv_columnar(path)`` returns ``{column_name: np.ndarray}`` (int64 or
float64 columns). The shared library is built on first use with the
toolchain's g++ (cached next to the source); if the build or load fails, the
caller should fall back to pandas — use :func:`available` to probe.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libfastcsv.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _build_failed = True
        return None
    lib.csv_open.restype = ctypes.c_void_p
    lib.csv_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.csv_nrows.restype = ctypes.c_longlong
    lib.csv_nrows.argtypes = [ctypes.c_void_p]
    lib.csv_ncols.restype = ctypes.c_int
    lib.csv_ncols.argtypes = [ctypes.c_void_p]
    lib.csv_colname.restype = ctypes.c_char_p
    lib.csv_colname.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.csv_coltype.restype = ctypes.c_int
    lib.csv_coltype.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.csv_copy_col.restype = None
    lib.csv_copy_col.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    lib.csv_error.restype = ctypes.c_char_p
    lib.csv_error.argtypes = [ctypes.c_void_p]
    lib.csv_close.restype = None
    lib.csv_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_csv_columnar(path: str, nthreads: int = 0) -> Dict[str, np.ndarray]:
    """Parse a numeric CSV into {name: int64/float64 array} natively."""
    lib = _load()
    if lib is None:
        raise RuntimeError("fastcsv native library unavailable")
    handle = lib.csv_open(path.encode(), nthreads)
    try:
        err = lib.csv_error(handle)
        if err:
            raise RuntimeError(err.decode())
        nrows = lib.csv_nrows(handle)
        out: Dict[str, np.ndarray] = {}
        for c in range(lib.csv_ncols(handle)):
            name = lib.csv_colname(handle, c).decode()
            dtype = np.int64 if lib.csv_coltype(handle, c) == 0 else np.float64
            arr = np.empty(nrows, dtype=dtype)
            lib.csv_copy_col(handle, c, arr.ctypes.data_as(ctypes.c_void_p))
            out[name] = arr
        return out
    finally:
        lib.csv_close(handle)
