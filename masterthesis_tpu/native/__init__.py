"""Native host preprocessing (C++/libjpeg via ctypes).

Builds ``libmtpreproc.so`` from preproc.cc on first use (g++, cached next to
the source) and exposes the fused decode->resize->crop->flip->normalize
pipeline. ctypes releases the GIL during the C call, so loader threads
overlap fully with device compute. Falls back gracefully: callers should
check ``available()``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preproc.cc")
_LIB_PATH = os.path.join(_HERE, "libmtpreproc.so")
_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-ljpeg",
        "-o", _LIB_PATH,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"g++ invocation failed: {e}"
    if proc.returncode != 0:
        return f"g++ failed: {proc.stderr[-2000:]}"
    return None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            err = _build()
            if err:
                _build_error = err
                return
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            _build_error = str(e)
            return
        lib.mt_preprocess.restype = ctypes.c_int
        lib.mt_preprocess.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p,
        ]
        lib.mt_decode_resize.restype = ctypes.c_int
        lib.mt_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p,
        ]
        _lib = lib


def available() -> bool:
    _load()
    return _lib is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def preprocess_jpeg(
    data: bytes,
    load_size: int,
    crop_size: int,
    crop_top: int,
    crop_left: int,
    flip: bool = False,
    normalize: bool = True,
) -> np.ndarray:
    """Fused decode->resize(load,load)->crop->flip[->normalize]."""
    _load()
    if _lib is None:
        raise RuntimeError(f"native preproc unavailable: {_build_error}")
    if normalize:
        out = np.empty((crop_size, crop_size, 3), np.float32)
    else:
        out = np.empty((crop_size, crop_size, 3), np.uint8)
    rc = _lib.mt_preprocess(
        data, len(data), load_size, load_size, crop_top, crop_left, crop_size,
        1 if flip else 0, 1 if normalize else 0,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError(f"mt_preprocess failed with code {rc}")
    return out


def decode_resize_jpeg(data: bytes, load_size: int) -> np.ndarray:
    """Decode + antialiased bicubic resize to (load, load) uint8."""
    _load()
    if _lib is None:
        raise RuntimeError(f"native preproc unavailable: {_build_error}")
    out = np.empty((load_size, load_size, 3), np.uint8)
    rc = _lib.mt_decode_resize(data, len(data), load_size, load_size,
                               out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError(f"mt_decode_resize failed with code {rc}")
    return out
