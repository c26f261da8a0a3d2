"""ctypes wrapper around the native bulk .npy loader (build-on-first-use).

`load_npy_batch(paths, shape)` preads + parses every file on a C++ thread
pool into ONE preallocated float32 block — the dataset-init counterpart of
the reference's torch-DataLoader C++ workers (datasets/ShapeNet_55.py pulls
each cloud through np.load serially under the GIL; with thousands of 176 KB
files that serial walk dominates startup).

The shared library is JIT-built with g++ on first use (the same
build-on-demand discipline as the reference's CUDA extensions) and cached
next to the source; every failure path — no compiler, build error, file the
fast path can't parse (non-'<f4', Fortran order, wrong shape) — falls back
to np.load with identical results.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_NATIVE_DIR, "fastload.cc")
_LIB = os.path.join(_NATIVE_DIR, "libldtfastload.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build_if_needed() -> bool:
    """g++ the shared library when missing or older than its source."""
    try:
        if (os.path.exists(_LIB)
                and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
            return True
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-pthread", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not _build_if_needed():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.ldt_load_npy_batch.restype = ctypes.c_int
            lib.ldt_load_npy_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ]
        except OSError:
            _lib_failed = True
            return None
        _lib = lib
        return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_npy_batch(paths: Sequence[str], shape: Tuple[int, ...],
                   n_threads: int = 0,
                   strict_shape: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Load `len(paths)` float32 .npy files of `shape` into [N, *shape].

    Returns (block, ok_mask). Files the native path rejects (missing, not
    '<f4', wrong shape/order) are retried with np.load; entries that still
    fail have ok_mask False (caller decides whether to skip — the reference
    loader skips unreadable files, ShapeNet_55.py:96-99).

    With `strict_shape`, a file np.load CAN read but whose shape mismatches
    raises instead of being masked out — the reference hard-asserts 15000
    points after a successful load (ShapeNet_55.py:101), so a corrupt
    dataset should fail loudly, not silently shrink.
    """
    n = len(paths)
    out = np.empty((n,) + tuple(shape), np.float32)
    ok = np.ones((n,), bool)
    if n == 0:
        return out, ok

    lib = _get_lib()
    statuses = np.full((n,), -1, np.int32)
    if lib is not None:
        c_paths = (ctypes.c_char_p * n)(
            *[p.encode() for p in paths])
        # full shape tuple, validated dim-by-dim in the native parser (an
        # element-count check alone would load transposed/flattened files
        # of coincidentally equal size as silently scrambled data)
        c_shape = np.asarray(shape, np.int64)
        lib.ldt_load_npy_batch(
            c_paths, n,
            c_shape.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(shape),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            int(n_threads))
    for i in np.nonzero(statuses != 0)[0]:
        try:
            arr = np.load(paths[i])
        except Exception:
            ok[i] = False
            continue
        if arr.shape != tuple(shape):
            if strict_shape:
                raise ValueError(
                    f"{paths[i]}: shape {arr.shape} != expected {shape}")
            ok[i] = False
            continue
        out[i] = arr.astype(np.float32)
    return out, ok
