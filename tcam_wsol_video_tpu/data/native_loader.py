"""ctypes bindings for the native batch image loader (JPEG decode +
resize + crop/flip + normalize in C++/OpenMP).

Falls back to the PIL path transparently when g++/libjpeg are missing —
call `available()` to check.  The geometric conventions match
data/transforms.PairedTransform except the resize: native uses half-pixel
bilinear without antialiasing (the torch convention), PIL antialiases;
CAMs and ROIs keep flowing through the python path either way (they are
tiny next to the image decode work).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "fastloader.cpp")
# arch-tagged: a -march=native .so from another host must never load
from tcam_wsol_video_tpu.core.nativebuild import tagged_lib_path  # noqa: E402
_LIB = tagged_lib_path(_NATIVE_DIR, "libfastloader")

_lib = None
_checked = False


def build_native(force: bool = False) -> str:
    if force or (not os.path.isfile(_LIB)
                 or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             _SRC, "-ljpeg", "-o", _LIB],
            check=True, capture_output=True)
    return _LIB


def available() -> bool:
    global _lib, _checked
    if _checked:
        return _lib is not None
    _checked = True
    try:
        lib = ctypes.CDLL(build_native())
        fp = ctypes.POINTER(ctypes.c_float)
        ip = ctypes.POINTER(ctypes.c_int)
        up = ctypes.POINTER(ctypes.c_ubyte)
        lib.load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ip, ip, up, fp, fp]
        lib.load_batch.restype = ctypes.c_int
        _lib = lib
        return True
    except Exception:
        _lib = None
        return False


def load_batch(paths: List[str], resize: int, crop: int,
               xs: Optional[np.ndarray] = None,
               ys: Optional[np.ndarray] = None,
               flips: Optional[np.ndarray] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+resize+crop+flip+normalize a batch.
    Returns (normalized (N, crop, crop, 3), raw (N, crop, crop, 3))."""
    assert available(), "native loader unavailable"
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    xs = np.zeros(n, np.int32) if xs is None else xs.astype(np.int32)
    ys = np.zeros(n, np.int32) if ys is None else ys.astype(np.int32)
    flips = (np.zeros(n, np.uint8) if flips is None
             else flips.astype(np.uint8))
    out_norm = np.empty((n, crop, crop, 3), np.float32)
    out_raw = np.empty((n, crop, crop, 3), np.float32)
    rc = _lib.load_batch(
        c_paths, n, resize, resize, crop,
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out_norm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_raw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"failed to decode {paths[rc - 1]}")
    return out_norm, out_raw
