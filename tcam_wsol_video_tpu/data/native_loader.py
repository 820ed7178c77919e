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
        lib.decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, up]
        lib.decode_resize_batch.restype = ctypes.c_int
        lib.crop_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ip, ip, up, fp, fp]
        lib.crop_batch_u8.restype = None
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


def decode_resize_u8(paths: List[str], resize: int) -> np.ndarray:
    """Decode + resize to (N, resize, resize, 3) uint8 — the pool-fill
    primitive for the device-resident train feed (data/device_feed.py);
    the same decode_resize_batch the DecodedFrameCache uses."""
    assert available(), "native loader unavailable"
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    buf = np.empty((n, resize, resize, 3), np.uint8)
    rc = _lib.decode_resize_batch(
        c_paths, n, resize, resize,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if rc != 0:
        raise IOError(f"failed to decode {paths[rc - 1]}")
    return buf


class DecodedFrameCache:
    """Epoch-persistent LRU cache of post-resize pre-crop uint8 frames.

    The pipeline's dominant host cost is JPEG decode+resize, and it was
    paid for every frame every epoch (the reference pays it in its
    DataLoader workers too — train_wsol.py:1107-1153).  Augmentation
    (crop/flip) changes per epoch but the decoded, resized frame does
    not: cache it once at `resize` resolution as uint8 (one rounding of
    the f32 bilinear output, <= 0.5/255 on raw pixels — the same
    quantization h2d_transfer=uint8 applies before upload anyway) and
    replay epochs >= 2 from RAM.

    Sizing: a 256px frame is ~192 KiB, so budget_mb=512 holds ~2700
    frames.  Eval splits (fixed frames) hit 100% once warm; train with
    random frame-per-shot converges to the full touched-frame
    population — size the budget to cover it (YTOv1 train ~one epoch's
    frames ~ 0.55 GiB) or accept proportional hit rates.  LRU keeps the
    working set fresh either way.
    """

    def __init__(self, budget_mb: int = 512):
        from collections import OrderedDict
        self.budget = int(budget_mb) * (1 << 20)
        self.frames: "OrderedDict[Tuple[str, int], np.ndarray]" = \
            OrderedDict()
        self.bytes = 0
        self.hits = 0
        self.misses = 0

    def load_batch(self, paths: List[str], resize: int, crop: int,
                   xs: np.ndarray, ys: np.ndarray, flips: np.ndarray
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Drop-in replacement for module-level load_batch."""
        assert available(), "native loader unavailable"
        n = len(paths)
        # dedupe misses: the same frame can appear twice in one batch
        # (temporal knn clamps at shot boundaries) — decode it once and
        # count its bytes once, or self.bytes drifts up and over-evicts.
        # hits/misses count FRAMES SERVED (hits+misses == total frames
        # through the cache, so hit_rate is a true served-from-RAM
        # fraction): a duplicate of a cold frame is a miss too — at its
        # lookup the key is still absent.
        missing: List[str] = []
        seen = set()
        for p in paths:
            k = (p, resize)
            if k in self.frames:
                self.frames.move_to_end(k)
                self.hits += 1
            else:
                self.misses += 1
                if p not in seen:
                    seen.add(p)
                    missing.append(p)
        if missing:
            c_paths = (ctypes.c_char_p * len(missing))(
                *[p.encode() for p in missing])
            buf = np.empty((len(missing), resize, resize, 3), np.uint8)
            rc = _lib.decode_resize_batch(
                c_paths, len(missing), resize, resize,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
            if rc != 0:
                raise IOError(f"failed to decode {missing[rc - 1]}")
            for j, p in enumerate(missing):
                frame = buf[j].copy()
                self.frames[(p, resize)] = frame
                self.bytes += frame.nbytes
        # LRU eviction — but never below the in-flight batch (every
        # current key was just touched, so it sits at the MRU end)
        while self.bytes > self.budget and len(self.frames) > n:
            _, old = self.frames.popitem(last=False)
            self.bytes -= old.nbytes

        srcs =(ctypes.POINTER(ctypes.c_ubyte) * n)(
            *[self.frames[(p, resize)].ctypes.data_as(
                ctypes.POINTER(ctypes.c_ubyte)) for p in paths])
        out_norm = np.empty((n, crop, crop, 3), np.float32)
        out_raw = np.empty((n, crop, crop, 3), np.float32)
        _lib.crop_batch_u8(
            srcs, n, resize, resize, crop,
            np.ascontiguousarray(xs, np.int32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int)),
            np.ascontiguousarray(ys, np.int32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int)),
            np.ascontiguousarray(flips, np.uint8).ctypes.data_as(
                ctypes.POINTER(ctypes.c_ubyte)),
            out_norm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_raw.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out_norm, out_raw
