"""ctypes bindings for the native CPU bilateral-grid filter.

The reference binds its C++ permutohedral filters through SWIG
(/root/reference/dlib/crf/crfwrapper/*/setup.py); here the native library
is a plain C ABI loaded with ctypes (no pybind11 in the image), compiled
on demand with g++ -O3 -fopenmp.

The native path is a CPU fallback / cross-check: the production CRF runs
on TPU (ops/crf.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "bilateral_grid.cpp")
# arch-tagged: a -march=native .so from another host must never load
from tcam_wsol_video_tpu.core.nativebuild import tagged_lib_path  # noqa: E402
_LIB = tagged_lib_path(_NATIVE_DIR, "libbilateral_grid")

_lib: Optional[ctypes.CDLL] = None


def build_native(force: bool = False) -> str:
    """Compile the shared library if needed; returns its path."""
    if force or (not os.path.isfile(_LIB)
                 or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
               "-fPIC", _SRC, "-o", _LIB]
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_native())
        fp = ctypes.POINTER(ctypes.c_float)
        lib.bilateral_filter_batch.argtypes = [
            fp, fp, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float]
        lib.bilateral_filter_batch.restype = None
        lib.color_bilateral_filter_batch.argtypes = [
            fp, fp, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float]
        lib.color_bilateral_filter_batch.restype = None
        _lib = lib
    return _lib


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def bilateral_filter_batch_native(images: np.ndarray, segs: np.ndarray,
                                  sigma_rgb: float,
                                  sigma_xy: Optional[float]) -> np.ndarray:
    """images: (N, H, W, 3) float32 [0,255]; segs: (N, H, W, K) float32.
    sigma_xy=None -> color-only filter.  Returns AS (approximate)."""
    lib = _load()
    images = np.ascontiguousarray(images, np.float32)
    segs = np.ascontiguousarray(segs, np.float32)
    n, h, w, k = segs.shape
    out = np.zeros_like(segs)
    if sigma_xy is None:
        lib.color_bilateral_filter_batch(
            _as_c(images), _as_c(segs), _as_c(out), n, k, h, w,
            ctypes.c_float(sigma_rgb))
    else:
        lib.bilateral_filter_batch(
            _as_c(images), _as_c(segs), _as_c(out), n, k, h, w,
            ctypes.c_float(sigma_rgb), ctypes.c_float(sigma_xy))
    return out
