"""ctypes binding for the native async artifact writer.

Compiles ``native/artifact_writer.cpp`` on first use (g++ + zlib, cached as
a shared library next to the source). Provides fire-and-forget .npy and
grayscale-PNG writes on a background C++ thread pool — the experiment
runner's ~20 artifact/snapshot writes then overlap the solve instead of
serializing matplotlib figure renders after it (the reference writes every
snapshot synchronously in-loop, ``block_6_admm_loop_ver2.py:269-281``).

Falls back cleanly: callers check :func:`available` and use numpy /
matplotlib when the toolchain is missing. ``flush()`` must be called before
reading the files back (the runners flush once per run).
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
_SRC = os.path.join(_REPO_ROOT, "native", "artifact_writer.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libartifactwriter.so")
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
                "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
                "-o", _LIB, "-lz", "-lpthread",
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True, text=True)
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                raise NativeUnavailable(f"build failed: {e}") from e
        lib = ctypes.CDLL(_LIB)
        lib.aw_init.argtypes = [ctypes.c_int]
        lib.aw_submit_npy.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_long), ctypes.c_int,
        ]
        lib.aw_submit_png_gray.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ]
        lib.aw_flush.argtypes = []
        lib.aw_init(2)
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def save_npy(path: str, arr: np.ndarray) -> None:
    """Queue an async float32 .npy write (numpy-compatible format)."""
    lib = _load()
    a = np.ascontiguousarray(arr, dtype=np.float32)
    shape = (ctypes.c_long * a.ndim)(*a.shape)
    rc = lib.aw_submit_npy(
        path.encode(), a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        shape, ctypes.c_int(a.ndim),
    )
    if rc != 0:
        raise RuntimeError(f"aw_submit_npy failed for {path}")


def save_png_gray(path: str, img: np.ndarray, vmin=None, vmax=None) -> None:
    """Queue an async 8-bit grayscale PNG write of a 2-D array."""
    lib = _load()
    a = np.ascontiguousarray(img, dtype=np.float32)
    assert a.ndim == 2
    vmin = float(np.min(a)) if vmin is None else float(vmin)
    vmax = float(np.max(a)) if vmax is None else float(vmax)
    rc = lib.aw_submit_png_gray(
        path.encode(), a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(a.shape[0]), ctypes.c_int(a.shape[1]),
        ctypes.c_float(vmin), ctypes.c_float(vmax),
    )
    if rc != 0:
        raise RuntimeError(f"aw_submit_png_gray failed for {path}")


def flush() -> None:
    """Block until all queued writes have hit disk."""
    _load().aw_flush()
