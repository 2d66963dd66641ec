"""ctypes bridge to the native C++ fast paths (native/gvtpu_native.cpp).

Loads native/build/libgvtpu_native.so when present (build with
`make -C native`); every entry point has a pure-Python fallback in its
caller, so the library is optional.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_ROOT = Path(__file__).resolve().parent.parent.parent


def _find_so() -> Path:
    """Locate the optional native library. The C++ sources live in the repo's
    native/ directory (a SOURCE-CHECKOUT feature: wheel installs fall back to
    the pure-Python paths everywhere); GVTPU_NATIVE_SO points at a prebuilt
    .so explicitly for installed deployments."""
    import os

    env = os.environ.get("GVTPU_NATIVE_SO")
    if env:
        return Path(env)
    return _ROOT / "native" / "build" / "libgvtpu_native.so"


_SO = _find_so()
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def build() -> bool:
    """Compile the native library (requires g++/make)."""
    global _load_attempted
    try:
        subprocess.run(["make", "-C", str(_ROOT / "native")], check=True, capture_output=True)
        _load_attempted = False  # retry: a fresh build supersedes a cached failure
        return _load() is not None
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


_ABI_VERSION = 3


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None:
        return _lib
    if _load_attempted:
        # covers both "no .so on disk" and "stale ABI": without this,
        # every native call would re-dlopen and re-configure the CDLL
        return None
    _load_attempted = True
    if not _SO.exists():
        return None
    lib = ctypes.CDLL(str(_SO))
    # ABI gate FIRST: a stale .so may lack symbols added in newer ABIs, so
    # binding argtypes before this check would raise AttributeError instead
    # of reaching the warn-and-disable fallback.
    try:
        lib.gv_abi_version.restype = ctypes.c_int
        got = lib.gv_abi_version()
    except AttributeError:
        got = 0
    if got != _ABI_VERSION:
        import warnings

        warnings.warn(
            f"libgvtpu_native.so has ABI {got}, expected {_ABI_VERSION}; "
            f"native fast paths disabled — rebuild with `make -C native`",
            RuntimeWarning,
            stacklevel=2,
        )
        return None
    lib.gv_parse_floats.restype = ctypes.c_int64
    lib.gv_parse_floats.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.gv_binvox_rle_decode.restype = ctypes.c_int64
    lib.gv_binvox_rle_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    lib.gv_binvox_rle_count.restype = ctypes.c_int64
    lib.gv_binvox_rle_count.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
    ]
    lib.gv_binvox_rle_to_points.restype = ctypes.c_int64
    lib.gv_binvox_rle_to_points.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.gv_write_bit_planes.restype = ctypes.c_int64
    lib.gv_write_bit_planes.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
        ctypes.c_int, ctypes.c_int64,
    ]
    lib.gv_read_bit_planes.restype = ctypes.c_int64
    lib.gv_read_bit_planes.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
        ctypes.c_int, ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_xyz(data: bytes) -> Optional[np.ndarray]:
    """[N,3] float32 from ASCII bytes, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    max_floats = max(len(data) // 2, 16)
    out = np.empty(max_floats, np.float32)
    n = lib.gv_parse_floats(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_floats
    )
    n = (n // 3) * 3
    return out[:n].reshape(-1, 3).copy()


def binvox_rle_points(rle: bytes, size: int, height: int, width: int) -> np.ndarray:
    """Direct RLE -> [N,3] int32 occupied (x,y,z) coords (no dense grid).

    ctypes releases the GIL for the duration of the C call, so batch loads
    (files.load_point_clouds) decode truly in parallel across threads."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not loaded")
    rle_arr = np.frombuffer(rle, np.uint8)
    rle_ptr = rle_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    n_occ = lib.gv_binvox_rle_count(rle_ptr, len(rle_arr), size)
    out = np.empty((max(int(n_occ), 1), 3), np.int32)
    n = lib.gv_binvox_rle_to_points(
        rle_ptr, len(rle_arr), size, height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_occ,
    )
    return out[: int(n)]


def write_bit_planes(planes: np.ndarray, fd: int, offset: int) -> bool:
    """Stream plane-major uint32[8, N] to voxel-major 32-byte records at
    ``offset`` of the open file ``fd`` (the reference bit-map disk body),
    interleaving through one fixed 8 MiB chunk — peak extra memory is the
    chunk, vs 3 map-sized intermediates on the numpy path. Caller must have
    flushed any Python-side write buffer first (pwrite bypasses it)."""
    lib = _load()
    if lib is None:
        return False
    planes = np.ascontiguousarray(planes, np.uint32)
    n = planes.shape[1]
    wrote = lib.gv_write_bit_planes(
        planes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), n, fd, offset
    )
    return int(wrote) == n


def read_bit_planes(n: int, fd: int, offset: int) -> Optional[np.ndarray]:
    """Reverse of write_bit_planes: voxel-major records at ``offset`` ->
    plane-major uint32[8, n]. Returns None when the native tier is absent
    or the read fails (caller falls back to the numpy path)."""
    lib = _load()
    if lib is None:
        return None
    planes = np.empty((8, n), np.uint32)
    got = lib.gv_read_bit_planes(
        planes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), n, fd, offset
    )
    return planes if int(got) == n else None


def binvox_rle_decode(rle: bytes, size: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not loaded")
    rle_arr = np.frombuffer(rle, np.uint8)
    out = np.zeros(size, np.uint8)
    lib.gv_binvox_rle_decode(
        rle_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(rle_arr),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size,
    )
    return out
