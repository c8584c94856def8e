"""ctypes bindings for the native C++ OSQP-style reference solver.

Builds ``native/libosqpref.so`` on demand (g++ is in the image; pybind11 is
not, so the C ABI + ctypes is the binding layer). Falls back gracefully —
callers should use :func:`available` and skip if the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libosqpref.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.osqp_ref_setup.restype = ctypes.c_void_p
    lib.osqp_ref_setup.argtypes = [ctypes.c_int, ctypes.c_int, dp, dp, dp, dp, dp, dp]
    lib.osqp_ref_update.restype = None
    lib.osqp_ref_update.argtypes = [ctypes.c_void_p, dp, dp, dp]
    lib.osqp_ref_solve.restype = ctypes.c_int
    lib.osqp_ref_solve.argtypes = [ctypes.c_void_p, dp, dp, ctypes.POINTER(ctypes.c_int)]
    lib.osqp_ref_warm_start.restype = None
    lib.osqp_ref_warm_start.argtypes = [ctypes.c_void_p, dp, dp]
    lib.osqp_ref_free.restype = None
    lib.osqp_ref_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


STATUS_NAMES = {0: "unsolved", 1: "solved", 2: "max iterations",
                3: "primal infeasible", 4: "dual infeasible"}


class NativeOSQPRef:
    """Same problem contract as tools.osqp_ref.OSQPRef, C++ core."""

    def __init__(self, P, q, A, l, u, rho=0.1, sigma=1e-6, alpha=1.6,
                 eps_abs=1e-3, eps_rel=1e-3, eps_pinf=1e-4, eps_dinf=1e-4,
                 max_iter=4000, check_every=25, adaptive_rho=True):
        lib = _load()
        if lib is None:
            raise RuntimeError("native solver unavailable (build failed)")
        self._lib = lib
        self.n = P.shape[0]
        self.m = A.shape[0]
        self._P = np.ascontiguousarray(P, dtype=np.float64)
        self._q = np.ascontiguousarray(q, dtype=np.float64)
        self._A = np.ascontiguousarray(A, dtype=np.float64)
        self._l = np.ascontiguousarray(l, dtype=np.float64)
        self._u = np.ascontiguousarray(u, dtype=np.float64)
        st = np.array([rho, sigma, alpha, eps_abs, eps_rel, eps_pinf, eps_dinf,
                       max_iter, check_every, float(adaptive_rho)], dtype=np.float64)
        dp = ctypes.POINTER(ctypes.c_double)
        self._h = lib.osqp_ref_setup(
            self.n, self.m,
            self._P.ctypes.data_as(dp), self._q.ctypes.data_as(dp),
            self._A.ctypes.data_as(dp), self._l.ctypes.data_as(dp),
            self._u.ctypes.data_as(dp), st.ctypes.data_as(dp),
        )
        if not self._h:
            raise RuntimeError("native setup failed (factorization error)")

    def update(self, l=None, u=None, A=None):
        dp = ctypes.POINTER(ctypes.c_double)
        lp = up = ap = None
        if l is not None:
            self._l = np.ascontiguousarray(l, dtype=np.float64)
            lp = self._l.ctypes.data_as(dp)
        if u is not None:
            self._u = np.ascontiguousarray(u, dtype=np.float64)
            up = self._u.ctypes.data_as(dp)
        if A is not None:
            self._A = np.ascontiguousarray(A, dtype=np.float64)
            ap = self._A.ctypes.data_as(dp)
        self._lib.osqp_ref_update(self._h, lp, up, ap)

    def solve(self):
        dp = ctypes.POINTER(ctypes.c_double)
        x = np.zeros(self.n)
        y = np.zeros(self.m)
        iters = ctypes.c_int(0)
        code = self._lib.osqp_ref_solve(
            self._h, x.ctypes.data_as(dp), y.ctypes.data_as(dp),
            ctypes.byref(iters),
        )
        from tools.osqp_ref import RefResult

        return RefResult(x=x, y=y, z=self._A @ x, status=STATUS_NAMES[code],
                         iters=int(iters.value), pri_res=np.nan, dua_res=np.nan)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.osqp_ref_free(self._h)
            self._h = None
