"""ctypes loader for the native image kernels (builds on first use)."""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "image_ops.cc")
_LIB = os.path.join(_DIR, "libband_image_ops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    from ...native_build import atomic_build

    return atomic_build(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC], _LIB
    )


def load() -> Optional[ctypes.CDLL]:
    """Native kernel library, built on demand; None if unavailable."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _load_failed = True
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i = ctypes.c_int
        lib.resize_bilinear_u8.argtypes = [u8p, i, i, i, u8p, i, i]
        lib.resize_nearest_u8.argtypes = [u8p, i, i, i, u8p, i, i]
        lib.nv_to_rgb_u8.argtypes = [u8p, u8p, i, i, i, u8p]
        lib.i420_to_rgb_u8.argtypes = [u8p, u8p, u8p, i, i, u8p]
        lib.rgb_to_gray_u8.argtypes = [u8p, i, u8p]
        lib.rgba_to_rgb_u8.argtypes = [u8p, i, u8p]
        lib.rotate_u8.argtypes = [u8p, i, i, i, i, u8p]
        lib.flip_u8.argtypes = [u8p, i, i, i, i, u8p]
        lib.normalize_u8_f32.argtypes = [u8p, i, ctypes.c_float,
                                         ctypes.c_float, f32p]
        lib.normalize_u8_f32_perchannel.argtypes = [u8p, i, i, f32p,
                                                    f32p, f32p]
        _lib = lib
        return _lib
