"""ctypes bindings for the native all-threshold contour-box sweep.

One union-find pass per image replaces the ~1000 cv2.threshold +
findContours calls of the exact benchmark protocol (native/boxsweep.cpp
— max-tree for outer contours, dual min-tree for cv2's inner hole
contours), and folds the (+1-pixel) IoU against GT in, so a CAM batch
costs one C call.  Exactness vs the cv2 path is enforced by
tests/test_metrics.py::test_native_sweep_matches_cv2_protocol.

Falls back transparently (available() -> False) when g++ is missing.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "boxsweep.cpp")
# arch-tagged: a -march=native .so from another host must never load
from tcam_wsol_video_tpu.core.nativebuild import tagged_lib_path  # noqa: E402
_LIB = tagged_lib_path(_NATIVE_DIR, "libboxsweep")

_lib = None
_checked = False


def build_native(force: bool = False) -> str:
    if force or (not os.path.isfile(_LIB)
                 or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
             _SRC, "-o", _LIB],
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
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int32)
        lib.sweep_best_iou.argtypes = [
            fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            dp, ctypes.c_int, fp, ip, ctypes.c_int, dp, ip]
        lib.sweep_best_iou.restype = ctypes.c_int
        lib.sweep_boxes_at.argtypes = [
            fp, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            fp, ctypes.c_int]
        lib.sweep_boxes_at.restype = ctypes.c_int
        _lib = lib
        return True
    except Exception:
        _lib = None
        return False


def sweep_best_iou(cams: np.ndarray, taus: Sequence[float],
                   gt_boxes_list: List[np.ndarray]
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """cams: (n, h, w) float32 in [0, 1]; gt_boxes_list[i]: (g_i, 4).
    Returns (best_iou (n, n_tau) float64, n_boxes (n, n_tau) int32)."""
    assert available()
    cams = np.ascontiguousarray(cams, np.float32)
    n, h, w = cams.shape
    taus_a = np.ascontiguousarray(taus, np.float64)
    max_gt = max((len(g) for g in gt_boxes_list), default=1) or 1
    gt = np.zeros((n, max_gt, 4), np.float32)
    cnt = np.zeros((n,), np.int32)
    for i, g in enumerate(gt_boxes_list):
        g = np.asarray(g, np.float32).reshape(-1, 4)
        gt[i, :len(g)] = g
        cnt[i] = len(g)
    best = np.zeros((n, len(taus_a)), np.float64)
    nbox = np.zeros((n, len(taus_a)), np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int32)
    rc = _lib.sweep_best_iou(
        cams.ctypes.data_as(fp), n, h, w,
        taus_a.ctypes.data_as(dp), len(taus_a),
        gt.ctypes.data_as(fp), cnt.ctypes.data_as(ip), max_gt,
        best.ctypes.data_as(dp), nbox.ctypes.data_as(ip))
    assert rc == 0, rc
    return best, nbox


def sweep_boxes_at(cam: np.ndarray, tau: float,
                   cap: int = 65536) -> np.ndarray:
    """All contour boxes of one cam at one threshold (parity testing)."""
    assert available()
    cam = np.ascontiguousarray(cam, np.float32)
    h, w = cam.shape
    out = np.zeros((cap, 4), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    nb = _lib.sweep_boxes_at(cam.ctypes.data_as(fp), h, w,
                             ctypes.c_double(tau),
                             out.ctypes.data_as(fp), cap)
    assert nb <= cap, nb
    return out[:nb]
