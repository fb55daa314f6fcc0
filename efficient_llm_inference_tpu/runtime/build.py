"""On-demand build + ctypes loader for the native runtime library.

Compiles runtime/rouge_native.cpp with g++ into a cached shared object the
first time it's needed (mirroring the reference's lazy load_inline build,
/root/reference/src/cuda/extensions.py:122-147, with g++ in place of nvcc).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import tempfile
import threading
from typing import Optional

_SRC = pathlib.Path(__file__).parent / "rouge_native.cpp"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _so_path() -> pathlib.Path:
    cache = pathlib.Path(tempfile.gettempdir()) / "elit_native"
    cache.mkdir(exist_ok=True)
    return cache / "librouge_native.so"


def build_native() -> Optional[pathlib.Path]:
    """Compile the library if needed; returns the .so path or None."""
    so = _so_path()
    if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(so)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return so
    except Exception:
        return None


def get_native_lib() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library; None on failure."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        so = build_native()
        if so is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(str(so))
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.lcs_len.argtypes = [i32p, ctypes.c_int32, i32p, ctypes.c_int32]
        lib.lcs_len.restype = ctypes.c_int32
        lib.ngram_overlap.argtypes = [
            i32p, ctypes.c_int32, i32p, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.ngram_overlap.restype = ctypes.c_int64
        lib.token_agreement.argtypes = [i32p, ctypes.c_int32, i32p, ctypes.c_int32]
        lib.token_agreement.restype = ctypes.c_int32
        _lib = lib
        return _lib


def _as_i32_array(ids):
    import numpy as np

    arr = np.ascontiguousarray(np.asarray(ids, dtype=np.int32))
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(arr)


def native_lcs_len(a_ids, b_ids) -> Optional[int]:
    lib = get_native_lib()
    if lib is None:
        return None
    a, ap, n = _as_i32_array(a_ids)
    b, bp, m = _as_i32_array(b_ids)
    return int(lib.lcs_len(ap, n, bp, m))


def native_ngram_overlap(a_ids, b_ids, order: int) -> Optional[int]:
    lib = get_native_lib()
    if lib is None:
        return None
    a, ap, n = _as_i32_array(a_ids)
    b, bp, m = _as_i32_array(b_ids)
    return int(lib.ngram_overlap(ap, n, bp, m, order))
