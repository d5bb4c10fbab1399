"""ctypes bridge to the C++ host-side native tier (native/agp_native.cpp).

Compiled on demand with g++ (cached in native/build/); everything degrades
to the pure-Python implementations in inducing/algorithms.py when a
compiler is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "agp_native.cpp")
_OUT = os.path.join(os.path.dirname(__file__), "..", "..", "native", "build", "libagp_native.so")


@lru_cache(maxsize=1)
def _lib():
    src = os.path.abspath(_SRC)
    out = os.path.abspath(_OUT)
    if not os.path.exists(src):
        return None
    try:
        if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
            os.makedirs(os.path.dirname(out), exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
                 src, "-o", out],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(out)
    except Exception:
        return None
    lib.kmeans_lloyd.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.oips_select.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.oips_select.restype = ctypes.c_int64
    return lib


def available() -> bool:
    return _lib() is not None


def kmeans(X: np.ndarray, k: int, n_iters: int = 20, seed: int = 0) -> np.ndarray:
    lib = _lib()
    X = np.ascontiguousarray(np.asarray(X, dtype=np.float64))
    n, d = X.shape
    rng = np.random.RandomState(seed)
    C = np.ascontiguousarray(X[rng.choice(n, size=min(k, n), replace=False)].copy())
    assign = np.zeros(n, dtype=np.int32)
    lib.kmeans_lloyd(
        X.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, d,
        C.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), C.shape[0],
        n_iters, assign.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return C


def oips(X: np.ndarray, rho: float, lengthscale: float, capacity: int) -> np.ndarray:
    lib = _lib()
    X = np.ascontiguousarray(np.asarray(X, dtype=np.float64))
    n, d = X.shape
    Z = np.zeros((capacity, d), dtype=np.float64)
    m = lib.oips_select(
        X.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, d,
        float(rho), float(lengthscale), capacity,
        Z.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return Z[:m]
