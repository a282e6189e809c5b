"""ctypes binding for the native async checkpoint packer.

Compiles ``native/checkpoint_packer.cpp`` on first use (g++ + zlib, cached
as a shared library next to the source). :func:`pack_npz` queues a
fire-and-forget multi-array ``.npz`` write (uncompressed/stored zip —
``np.load`` reads it back unchanged) on a background C++ thread pool, so
periodic checkpoints overlap the solve instead of blocking it on Python
zlib compression. Writes are atomic (tmp + rename inside the packer).

Capability anchor: the reference's chunked checkpoint/resume orchestration
(``block_6_admm_loop_ver2.py:269-281``); the numpy fallback path is
``data/serialization.save_checkpoint``.

Falls back cleanly: callers check :func:`available`. ``flush()`` must be
called before reading the files back (runners flush once per run).
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
_SRC = os.path.join(_REPO_ROOT, "native", "checkpoint_packer.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libcheckpointpacker.so")
_lock = threading.Lock()
_lib = None

# numpy dtype -> packer dtype code (checkpoint payloads are float state,
# int counters, bool stop flags).
_DTYPE_CODES = {
    np.dtype(np.float32): 0,
    np.dtype(np.float64): 1,
    np.dtype(np.int32): 2,
    np.dtype(np.int64): 3,
    np.dtype(np.bool_): 4,
    np.dtype(np.uint8): 5,
}


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
        lib.cp_init.argtypes = [ctypes.c_int]
        lib.cp_begin.restype = ctypes.c_longlong
        lib.cp_add.argtypes = [
            ctypes.c_longlong, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_long),
            ctypes.c_int,
        ]
        lib.cp_commit.argtypes = [ctypes.c_longlong, ctypes.c_char_p]
        lib.cp_abort.argtypes = [ctypes.c_longlong]
        lib.cp_flush.argtypes = []
        lib.cp_set_zip64_threshold.argtypes = [ctypes.c_ulonglong]
        lib.cp_set_crc_chunk.argtypes = [ctypes.c_ulonglong]
        lib.cp_init(1)
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def _canonical(arr) -> np.ndarray:
    """C-contiguous little-endian array with a packer-supported dtype."""
    a = np.asarray(arr)
    if a.dtype not in _DTYPE_CODES:
        # Anything exotic (e.g. bf16 history slots) downcasts to f32 — the
        # numpy fallback writer does the same implicit promotion on load.
        a = a.astype(np.float32)
    if a.dtype.byteorder == ">":
        a = a.astype(a.dtype.newbyteorder("<"))
    # ascontiguousarray promotes 0-d to 1-d — keep scalars 0-d (np.savez
    # parity; 0-d arrays are trivially contiguous).
    return np.ascontiguousarray(a) if a.ndim > 0 else a


def pack_npz(path: str, arrays: dict) -> None:
    """Queue an async .npz write of ``arrays`` (name -> array-like)."""
    lib = _load()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    handle = lib.cp_begin()
    try:
        for name, arr in arrays.items():
            a = _canonical(arr)
            shape = (ctypes.c_long * max(a.ndim, 1))(*(a.shape or (0,)))
            rc = lib.cp_add(
                handle, name.encode(), _DTYPE_CODES[a.dtype],
                a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                shape, ctypes.c_int(a.ndim),
            )
            if rc != 0:
                raise RuntimeError(f"cp_add failed for {name!r} (rc={rc})")
        rc = lib.cp_commit(handle, path.encode())
        handle = None
        if rc != 0:
            raise RuntimeError(f"cp_commit failed for {path} (rc={rc})")
    finally:
        if handle is not None:
            lib.cp_abort(handle)


def set_zip64_threshold(threshold: int) -> None:
    """Test hook: sizes/offsets at or above ``threshold`` use zip64 records
    (spec value 4 GiB; lowering it exercises the zip64 paths with small
    payloads). Pass 0 to restore the spec threshold."""
    _load().cp_set_zip64_threshold(ctypes.c_ulonglong(threshold))


def set_crc_chunk(chunk: int) -> None:
    """Test hook: crc32 is fed to zlib in ``chunk``-byte pieces (zlib's
    length argument is 32-bit, so >=4 GiB members MUST be chunked or the
    stored CRC covers only ``size mod 2**32`` bytes). Lowering the chunk
    exercises that loop with small members; 0 restores the 1 GiB default."""
    _load().cp_set_crc_chunk(ctypes.c_ulonglong(chunk))


def flush() -> None:
    """Block until all queued checkpoint writes have hit disk.

    Raises ``RuntimeError`` if any background write failed (ENOSPC, bad
    path, ...) — the packer keeps the previous checkpoint file intact on
    failure, so the error is loud but the last good checkpoint survives.
    """
    n_failed = _load().cp_flush()
    if n_failed:
        raise RuntimeError(
            f"{n_failed} async checkpoint write(s) failed; the previous "
            "checkpoint file (if any) was left in place"
        )
