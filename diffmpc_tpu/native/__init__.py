"""ctypes binding to the native C++ reference solver.

Builds ``native/diffmpc_native.cpp`` with g++ on first use (cached under
``native/build/``) and exposes :func:`solve_batch` with the same problem
contract as :func:`diffmpc_tpu.mpc.mpc_solve` — an independent
double-precision oracle for parity testing and a dependency-free host-side
solver (see the C++ file header for its role relative to the Pallas
kernels).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "diffmpc_native.cpp")
_BUILD = os.path.join(_REPO, "native", "build")
_SO = os.path.join(_BUILD, "libdiffmpc_native.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        os.makedirs(_BUILD, exist_ok=True)
        # compile to a per-process temp name, then atomically rename: several
        # processes (e.g. pytest-xdist workers) may race to build; each gets
        # a complete .so and the last rename wins without ever exposing a
        # partially-written file
        tmp = f"{_SO}.{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC], check=True
        )
        os.replace(tmp, _SO)
    lib = ctypes.CDLL(_SO)
    d = ctypes.POINTER(ctypes.c_double)
    lib.diffmpc_solve_batch.restype = None
    lib.diffmpc_solve_batch.argtypes = [
        d, d, d, d, d,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        d, d,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_int, ctypes.c_double,
        d, d, d,
    ]
    _lib = lib
    return lib


def solve_batch(
    C: np.ndarray,
    c: np.ndarray,
    F: np.ndarray,
    f: np.ndarray,
    x_init: np.ndarray,
    u_lower: Optional[np.ndarray] = None,
    u_upper: Optional[np.ndarray] = None,
    ilqr_iter: int = 30,
    pnqp_iter: int = 20,
    ls_decay: float = 0.2,
    ls_iter: int = 10,
    reg: float = 1e-9,
):
    """Solve a batch of affine-dynamics (box-constrained) iLQR problems in
    native f64. Shapes per SURVEY.md §2.2: C (T,B,nm,nm), c (T,B,nm),
    F (T,B,n,nm), f (T,B,n), x_init (B,n), bounds broadcastable to (T,B,m).

    Returns (xs (T,B,n), us (T,B,m), objs (B,))."""
    lib = _load()
    T, B, nm = c.shape
    n = x_init.shape[-1]
    m = nm - n
    constrained = u_lower is not None

    f64 = lambda a: np.ascontiguousarray(np.asarray(a, np.float64))
    # (T,B,...) -> per-scenario contiguous (B,T,...)
    sw = lambda a: np.ascontiguousarray(np.moveaxis(np.asarray(a, np.float64), 1, 0))
    Cb, cb, Fb, fb = sw(C), sw(c), sw(F), sw(f)
    x0 = f64(x_init)
    if constrained:
        lo = sw(np.broadcast_to(np.asarray(u_lower, np.float64), (T, B, m)))
        hi = sw(np.broadcast_to(np.asarray(u_upper, np.float64), (T, B, m)))
    xs = np.zeros((B, T, n))
    us = np.zeros((B, T, m))
    objs = np.zeros(B)

    d = ctypes.POINTER(ctypes.c_double)
    p = lambda a: a.ctypes.data_as(d)
    lib.diffmpc_solve_batch(
        p(Cb), p(cb), p(Fb), p(fb), p(x0),
        T, B, n, m,
        p(lo) if constrained else None,
        p(hi) if constrained else None,
        int(constrained), ilqr_iter, pnqp_iter,
        ls_decay, ls_iter, reg,
        p(xs), p(us), p(objs),
    )
    return np.moveaxis(xs, 0, 1), np.moveaxis(us, 0, 1), objs
