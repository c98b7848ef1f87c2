"""ctypes binding to the native IO runtime (native/slamio.cpp).

Compiled on demand with g++ (pybind11 is not available in this image);
the .so is cached next to the source. Falls back to None if no compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "slamio.cpp")
_SO = os.path.join(_NATIVE_DIR, "libslamio.so")

_lib = None


class VocabHeader(ctypes.Structure):
    _fields_ = [
        ("nb_nodes", ctypes.c_uint32),
        ("k", ctypes.c_int32),
        ("L", ctypes.c_int32),
        ("scoring", ctypes.c_int32),
        ("weighting", ctypes.c_int32),
    ]


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True,
        )
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.vocab_read_header.argtypes = [ctypes.c_char_p, ctypes.POINTER(VocabHeader)]
    lib.vocab_read_header.restype = ctypes.c_int
    lib.vocab_read_nodes.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.vocab_read_nodes.restype = ctypes.c_int
    lib.vocab_write.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.vocab_write.restype = ctypes.c_int
    lib.parse_sensor_csv.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
    ]
    lib.parse_sensor_csv.restype = ctypes.c_int64
    _lib = lib
    return lib
