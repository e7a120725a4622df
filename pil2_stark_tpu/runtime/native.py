"""ctypes bindings for the native host runtime (runtime/libpil2stark.so).

Builds the shared library on first use (make -C runtime) and exposes the
GL vector ops, batched Poseidon permutation, linear hash and Merkle-level
kernels.  Falls back to None when no C++ toolchain is available; callers
gate on `native_available()`.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libpil2stark.so")

lib = None


def _try_load():
    global lib
    if lib is not None:
        return lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _RUNTIME_DIR, "-s"],
                check=True,
                capture_output=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.gl64_add_vec.argtypes = [u64p, u64p, u64p, ctypes.c_size_t]
    lib.gl64_sub_vec.argtypes = [u64p, u64p, u64p, ctypes.c_size_t]
    lib.gl64_mul_vec.argtypes = [u64p, u64p, u64p, ctypes.c_size_t]
    lib.poseidon_permute_batch.argtypes = [u64p, ctypes.c_size_t]
    lib.linear_hash.argtypes = [u64p, ctypes.c_size_t, ctypes.c_size_t, u64p]
    lib.merkle_level.argtypes = [u64p, ctypes.c_size_t, u64p]
    return lib


def native_available() -> bool:
    return _try_load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def gl64_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    l = _try_load()
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    out = np.empty_like(a)
    l.gl64_mul_vec(_ptr(a), _ptr(b), _ptr(out), a.size)
    return out


def gl64_add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    l = _try_load()
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    out = np.empty_like(a)
    l.gl64_add_vec(_ptr(a), _ptr(b), _ptr(out), a.size)
    return out


def poseidon_permute(states: np.ndarray) -> np.ndarray:
    """Batched Poseidon over (n, 12) states (copy-in/out)."""
    l = _try_load()
    out = np.ascontiguousarray(states, dtype=np.uint64).copy()
    l.poseidon_permute_batch(_ptr(out), out.shape[0])
    return out


def linear_hash(rows: np.ndarray) -> np.ndarray:
    l = _try_load()
    rows = np.ascontiguousarray(rows, dtype=np.uint64)
    h, w = rows.shape
    out = np.empty((h, 4), dtype=np.uint64)
    l.linear_hash(_ptr(rows), h, w, _ptr(out))
    return out


def merkle_level(level: np.ndarray) -> np.ndarray:
    """(2m, 4) digests -> (m, 4)."""
    l = _try_load()
    level = np.ascontiguousarray(level, dtype=np.uint64)
    m = level.shape[0] // 2
    out = np.empty((m, 4), dtype=np.uint64)
    l.merkle_level(_ptr(level), m, _ptr(out))
    return out
