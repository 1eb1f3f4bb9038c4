"""ctypes loader for the native host runtime (native/raytracer_native.cpp).

Builds the shared library on first use if sources are present (make -C
native); every caller has a pure-Python fallback, so a missing toolchain
degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libraytracer_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def load() -> Optional[ctypes.CDLL]:
    """The native library, building it if needed; None if unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(
        os.path.join(_NATIVE_DIR, "Makefile")
    ):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.rt_build_bvh.restype = ctypes.c_int
    lib.rt_build_bvh.argtypes = [
        ctypes.c_int, f32p, f32p, f32p, i32p, ctypes.c_int, ctypes.c_int,
        f32p, f32p, i32p, i32p, i32p, i32p, i32p, ctypes.c_int,
    ]
    lib.rt_write_ppm.restype = ctypes.c_int
    lib.rt_write_ppm.argtypes = [
        ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return _lib
