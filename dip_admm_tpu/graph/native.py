"""ctypes binding for the native per-pixel graph builder.

Compiles ``native/pixel_graphs.cpp`` on first use (g++, cached as a shared
library next to the source) and exposes :func:`build_pixel_masks_native`
with the same mask semantics as ``topology.build_pixel_masks`` (equivalence
is tested). The native path is the fast host-side option for very large
pixel counts or accelerator-free processes; the jnp path remains the default
on TPU.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "pixel_graphs.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libpixelgraphs.so")
_lock = threading.Lock()
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not os.path.exists(_SRC):
                raise NativeUnavailable(f"source not found: {_SRC}")
            cmd = [
                "g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC,
                "-o", _LIB,
            ]
            try:
                subprocess.run(
                    cmd, check=True, capture_output=True, text=True
                )
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                raise NativeUnavailable(f"build failed: {e}") from e
        lib = ctypes.CDLL(_LIB)
        lib.build_pixel_masks.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.build_pixel_masks.restype = None
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def build_pixel_masks_native(
    q: np.ndarray, strategy: str = "knn", k: int = 2
) -> np.ndarray:
    """keep [P, P, n] bool from weights q [P, P, n] (knn | mst).

    Symmetrizes/zeroes the diagonal like the jnp builder, then runs the
    OpenMP C++ core over all pixels.
    """
    lib = _load()
    q = np.asarray(q, dtype=np.float32)
    P = q.shape[0]
    n = q.shape[2]
    q_sym = 0.5 * (q + q.transpose(1, 0, 2))
    q_sym[np.arange(P), np.arange(P), :] = 0.0
    qp = np.ascontiguousarray(np.moveaxis(q_sym, -1, 0))  # [n, P, P]
    out = np.zeros((n, P, P), dtype=np.uint8)
    strat = {"knn": 0, "mst": 1}.get(strategy)
    if strat is None:
        raise ValueError("native backend supports 'knn' and 'mst'")
    lib.build_pixel_masks(
        qp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n),
        ctypes.c_int(P),
        ctypes.c_int(strat),
        ctypes.c_int(k),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    keep = np.moveaxis(out.astype(bool), 0, -1)  # [P, P, n]
    return keep | keep.transpose(1, 0, 2)
