"""ctypes binding for the native batch-gather engine
(``stil_tta_tpu/data/native/loader.cpp``), with transparent numpy
fallback. Used by :class:`HostStream` to assemble contiguous batches
from memmapped datasets without serialising behind the GIL."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_DIR = Path(__file__).parent / "native"
_LIB_PATH = _LIB_DIR / "libloader.so"
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(["make", "-C", str(_LIB_DIR)], check=True,
                           capture_output=True)
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.gather_rows.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_int]
    lib.gather_rows_u8_to_f32.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_float, ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def gather_rows(src: np.ndarray, idx: np.ndarray,
                n_threads: int = 0) -> np.ndarray:
    """Equivalent of ``src[idx]`` for a C-contiguous (possibly
    memmapped) array, multithreaded in native code."""
    lib = _load()
    if lib is None:
        return np.ascontiguousarray(src[idx])
    idx = np.ascontiguousarray(idx, np.int64)
    row_shape = src.shape[1:]
    row_bytes = int(np.prod(row_shape)) * src.dtype.itemsize
    out = np.empty((len(idx),) + row_shape, src.dtype)
    n_threads = n_threads or min(os.cpu_count() or 1, 8)
    lib.gather_rows(
        src.ctypes.data_as(ctypes.c_void_p),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx), row_bytes, out.ctypes.data_as(ctypes.c_void_p),
        n_threads)
    return out


def gather_rows_scaled(src: np.ndarray, idx: np.ndarray,
                       scale: float = 1.0 / 255.0,
                       n_threads: int = 0) -> np.ndarray:
    """``src[idx].astype(f32) * scale`` fused into the native gather."""
    lib = _load()
    if lib is None or src.dtype != np.uint8:
        return src[idx].astype(np.float32) * scale
    idx = np.ascontiguousarray(idx, np.int64)
    row_shape = src.shape[1:]
    row_elems = int(np.prod(row_shape))
    out = np.empty((len(idx),) + row_shape, np.float32)
    n_threads = n_threads or min(os.cpu_count() or 1, 8)
    lib.gather_rows_u8_to_f32(
        src.ctypes.data_as(ctypes.c_void_p),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx), row_elems, out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_float(scale), n_threads)
    return out
