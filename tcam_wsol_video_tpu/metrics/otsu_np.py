"""Host Otsu threshold over unit-width integer bins.

Same semantics as the device version (ops/otsu.py) and the reference
STOtsu (/root/reference/dlib/cams/core_seeding.py:23-58); kept host-side
for the offline ROI builder and as a test oracle.
"""
from __future__ import annotations

import numpy as np


def otsu_np(x: np.ndarray) -> float:
    mn, mx = float(x.min()), float(x.max())
    if mn == mx:
        return mn
    bins = int(mx - mn + 1)
    centers = np.arange(mn, mx + 1, dtype=np.float64)
    hist, _ = np.histogram(x.ravel(), bins=bins, range=(mn, mx))
    hist = hist.astype(np.float64)
    w1 = np.cumsum(hist)
    w2 = np.cumsum(hist[::-1])[::-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        m1 = np.cumsum(hist * centers) / w1
        m2 = (np.cumsum((hist * centers)[::-1]) / np.cumsum(hist[::-1]))[::-1]
    var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    var12 = np.nan_to_num(var12, nan=-np.inf)
    return float(centers[:-1][int(np.argmax(var12))])


def otsu_skimage_np(x: np.ndarray) -> float:
    """Port of skimage.filters.threshold_otsu(image, nbins=256): histogram
    over 256 uniform bins spanning [min, max] (np.histogram — exactly what
    skimage's `histogram()` does for float input), threshold = center of
    the argmax inter-class-variance bin.

    This is the Otsu `GetRoiSingleCam.get_thresh` applies for ROI
    re-thresholding (/root/reference/dlib/cams/tcam_seeding.py:17,
    :424-430) — different bins (hence different thresholds and blobs)
    than STOtsu's unit-width `otsu_np` above.  Degenerate input
    (min == max) returns 0.0, get_thresh's early-out.
    """
    x = np.asarray(x, np.float64).ravel()
    if x.min() == x.max():
        return 0.0
    counts, bin_edges = np.histogram(x, bins=256)
    centers = (bin_edges[:-1] + bin_edges[1:]) / 2.0
    counts = counts.astype(np.float64)
    w1 = np.cumsum(counts)
    w2 = np.cumsum(counts[::-1])[::-1]
    m1 = np.cumsum(counts * centers) / w1
    m2 = (np.cumsum((counts * centers)[::-1]) / np.cumsum(counts[::-1]))[::-1]
    var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    return float(centers[:-1][int(np.argmax(var12))])
