"""ctypes bindings for the native host-data library (native/vitlens_host.cpp).

Provides fast FLAC decode and farthest-point sampling for the host data
pipeline, with transparent fallback to the pure-python implementations when
the shared library hasn't been built (run native/build.sh)."""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libvitlens_host.so"),
    os.environ.get("VITLENS_NATIVE_LIB", ""),
]

_lib = None
_build_attempted = False


def _maybe_build() -> None:
    """Build the shared library from source on first use (the .so is not
    shipped in version control; native/build.sh is the single source of
    truth for the compile command)."""
    global _build_attempted
    if _build_attempted:
        return
    _build_attempted = True
    import shutil
    import subprocess

    native_dir = os.path.dirname(_LIB_PATHS[0])
    src = os.path.join(native_dir, "vitlens_host.cpp")
    if os.path.exists(_LIB_PATHS[0]) or not os.path.exists(src):
        return
    if shutil.which("g++") is None or not os.access(native_dir, os.W_OK):
        return
    try:
        # build.sh is the single source of truth for the compile command
        subprocess.run(
            ["sh", os.path.join(native_dir, "build.sh")],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        pass  # callers fall back to the pure-python implementations


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not any(p and os.path.exists(p) for p in _LIB_PATHS):
        _maybe_build()
    for p in _LIB_PATHS:
        if p and os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.flac_probe.restype = ctypes.c_int
            lib.flac_probe.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ]
            lib.flac_decode.restype = ctypes.c_int64
            lib.flac_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ]
            lib.fps_indices.restype = None
            lib.fps_indices.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


def decode_flac_native(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """-> (float32 [channels, samples], rate) or None if lib/format
    unavailable (caller falls back to python)."""
    lib = _load()
    if lib is None:
        return None
    with open(path, "rb") as f:
        raw = f.read()
    rate = ctypes.c_int32()
    channels = ctypes.c_int32()
    bps = ctypes.c_int32()
    total = ctypes.c_int64()
    rc = lib.flac_probe(raw, len(raw), ctypes.byref(rate),
                        ctypes.byref(channels), ctypes.byref(bps),
                        ctypes.byref(total))
    if rc != 0 or total.value <= 0:
        return None
    out = np.zeros((channels.value, total.value), np.float32)
    n = lib.flac_decode(raw, len(raw),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        total.value)
    if n <= 0:
        return None
    return out[:, :n], rate.value


def fps_native(points: np.ndarray, npoint: int,
               start: int = 0) -> Optional[np.ndarray]:
    """points [N, >=3] -> sampled [npoint, C] or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(points[:, :3], np.float32)
    idx = np.zeros(npoint, np.int64)
    lib.fps_indices(xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    xyz.shape[0], npoint, start,
                    idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return points[idx]
