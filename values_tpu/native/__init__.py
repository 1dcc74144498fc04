"""ctypes bindings for the native host-side volume ops.

Builds ``libvolume_ops.so`` with g++ on first use (cached next to the
source); every entry point has a numpy fallback so the framework works
without a compiler. See volume_ops.cpp for the op inventory.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "volume_ops.cpp"
_LIB = Path(__file__).parent / "libvolume_ops.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    i64, u64 = ctypes.c_int64, ctypes.c_uint64
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.crop_f32.argtypes = [fp, i64, i64, i64, i64, i64, i64, i64, fp]
    lib.crop_i32.argtypes = [ip, i64, i64, i64, i64, i64, i64, i64, ip]
    lib.mirror3d_f32.argtypes = [fp, i64, ctypes.c_int]
    lib.mirror3d_i32.argtypes = [ip, i64, ctypes.c_int]
    lib.add_gaussian_noise_f32.argtypes = [fp, i64, ctypes.c_float, u64]
    lib.zscore_f32.argtypes = [fp, i64, ctypes.c_double]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def crop(src: np.ndarray, start, patch: int) -> np.ndarray:
    """Contiguous cube crop (float32/int32), native when possible."""
    lib = get_lib()
    if lib is None or not src.flags["C_CONTIGUOUS"]:
        sl = tuple(slice(s, s + patch) for s in start)
        return np.ascontiguousarray(src[sl])
    d0, d1, d2 = src.shape
    if src.dtype == np.float32:
        out = np.empty((patch,) * 3, dtype=np.float32)
        lib.crop_f32(_fptr(src), d0, d1, d2, *[int(s) for s in start],
                     patch, _fptr(out))
        return out
    if src.dtype == np.int32:
        out = np.empty((patch,) * 3, dtype=np.int32)
        lib.crop_i32(_iptr(src), d0, d1, d2, *[int(s) for s in start],
                     patch, _iptr(out))
        return out
    sl = tuple(slice(s, s + patch) for s in start)
    return np.ascontiguousarray(src[sl])


def mirror3d(vol: np.ndarray, flips: int) -> np.ndarray:
    """In-place axis mirroring of a contiguous cube; returns vol."""
    lib = get_lib()
    if lib is None or not vol.flags["C_CONTIGUOUS"] or (
            vol.dtype not in (np.float32, np.int32)):
        for axis in range(3):
            if flips & (1 << axis):
                vol = np.ascontiguousarray(np.flip(vol, axis=axis))
        return vol
    if vol.dtype == np.float32:
        lib.mirror3d_f32(_fptr(vol), vol.shape[0], flips)
    else:
        lib.mirror3d_i32(_iptr(vol), vol.shape[0], flips)
    return vol


def add_gaussian_noise(vol: np.ndarray, sigma: float, seed: int) -> np.ndarray:
    lib = get_lib()
    if lib is None or vol.dtype != np.float32 or not vol.flags[
            "C_CONTIGUOUS"]:
        rs = np.random.RandomState(seed & 0x7fffffff)
        return vol + rs.normal(0.0, sigma, size=vol.shape).astype(vol.dtype)
    lib.add_gaussian_noise_f32(_fptr(vol), vol.size,
                               ctypes.c_float(sigma),
                               ctypes.c_uint64(seed))
    return vol


def zscore(vol: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    lib = get_lib()
    if lib is None or vol.dtype != np.float32 or not vol.flags[
            "C_CONTIGUOUS"]:
        return ((vol - vol.mean()) / (vol.std() + eps)).astype(vol.dtype)
    lib.zscore_f32(_fptr(vol), vol.size, eps)
    return vol
