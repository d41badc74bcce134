"""ctypes bindings for the native batch assembler (native/tecloader.cpp).

Builds libtecloader.so on first use (g++, cached next to the source) and exposes
gather_windows(); SlidingWindowDataset uses it automatically when available and
falls back to numpy fancy indexing otherwise (pure-Python environments keep
working). The native path assembles batches with parallel contiguous memcpy —
each timestep row is a contiguous (N, C) slab.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "tecloader.cpp")
_LIB_NAME = "libtecloader.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False


def _build_and_load() -> ctypes.CDLL | None:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        logger.info("native loader source not found at %s", src)
        return None
    lib_path = os.path.join(os.path.dirname(src), _LIB_NAME)
    if (not os.path.exists(lib_path)) or (
        os.path.getmtime(lib_path) < os.path.getmtime(src)
    ):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", lib_path, src, "-lpthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            logger.info("built %s", lib_path)
        except (subprocess.SubprocessError, FileNotFoundError) as e:
            logger.warning("native loader build failed (%s); using numpy fallback", e)
            return None
    lib = ctypes.CDLL(lib_path)
    lib.tec_gather_windows.restype = ctypes.c_int
    lib.tec_gather_windows.argtypes = [
        ctypes.POINTER(ctypes.c_float),   # X
        ctypes.POINTER(ctypes.c_float),   # Y
        ctypes.POINTER(ctypes.c_int32),   # TF
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # T, N, C
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # L_out, F_t, L_in
        ctypes.POINTER(ctypes.c_int64),   # starts
        ctypes.c_int64, ctypes.c_int64,   # batch, num_threads
        ctypes.POINTER(ctypes.c_float),   # x_out
        ctypes.POINTER(ctypes.c_float),   # y_out
        ctypes.POINTER(ctypes.c_int32),   # tf_out
    ]
    lib.tec_standardize.restype = ctypes.c_int
    lib.tec_standardize.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    return lib


def get_lib() -> ctypes.CDLL | None:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is None and not _load_failed:
            _lib = _build_and_load()
            _load_failed = _lib is None
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def gather_windows(
    X: np.ndarray,          # (T, N, C) float32, C-contiguous
    Y: np.ndarray,          # (T, N, L_out) float32
    TF: np.ndarray,         # (T, F_t) int32
    starts: np.ndarray,     # (B,) int64 window start indices
    L_in: int,
    num_threads: int | None = None,
) -> dict[str, np.ndarray]:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    # the C side trusts raw pointers: a non-contiguous or wrong-dtype array
    # would be read as garbage (ctypes .data_as hands over the base pointer
    # regardless of strides) — refuse instead
    for name, arr, dt in (("X", X, np.float32), ("Y", Y, np.float32),
                          ("TF", TF, np.int32)):
        if not arr.flags.c_contiguous or arr.dtype != dt:
            raise ValueError(
                f"{name} must be C-contiguous {np.dtype(dt).name}, got "
                f"dtype={arr.dtype} contiguous={arr.flags.c_contiguous}"
            )
    t, n, c = X.shape
    l_out = Y.shape[-1]
    f_t = TF.shape[-1]
    b = len(starts)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    x_out = np.empty((b, L_in, n, c), dtype=np.float32)
    y_out = np.empty((b, n, l_out), dtype=np.float32)
    tf_out = np.empty((b, L_in, f_t), dtype=np.int32)
    if num_threads is None:
        num_threads = min(os.cpu_count() or 1, 8)
    rc = lib.tec_gather_windows(
        _ptr(X, ctypes.c_float), _ptr(Y, ctypes.c_float), _ptr(TF, ctypes.c_int32),
        t, n, c, l_out, f_t, L_in,
        _ptr(starts, ctypes.c_int64), b, num_threads,
        _ptr(x_out, ctypes.c_float), _ptr(y_out, ctypes.c_float),
        _ptr(tf_out, ctypes.c_int32),
    )
    if rc != 0:
        raise RuntimeError(f"tec_gather_windows failed with code {rc}")
    return {"x": x_out, "y": y_out, "time_features": tf_out}


def standardize_inplace(
    x: np.ndarray, mean: np.ndarray, scale: np.ndarray, num_threads: int | None = None
) -> bool:
    """Multithreaded in-place (x - mean) / scale over the last axis. Returns False
    (caller should fall back) when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    # contiguity must be checked on x itself BEFORE reshape: reshaping a
    # non-contiguous array returns a (contiguous) COPY, which would pass the
    # check, be standardized, and thrown away — silently leaving x untouched
    # while reporting success
    if not x.flags.c_contiguous or x.dtype != np.float32:
        return False
    c = x.shape[-1]
    flat = x.reshape(-1, c)
    mean = np.ascontiguousarray(mean, dtype=np.float64)
    scale = np.ascontiguousarray(scale, dtype=np.float64)
    if num_threads is None:
        num_threads = min(os.cpu_count() or 1, 16)
    rc = lib.tec_standardize(
        _ptr(flat, ctypes.c_float), flat.shape[0], c,
        _ptr(mean, ctypes.c_double), _ptr(scale, ctypes.c_double), num_threads,
    )
    return rc == 0
