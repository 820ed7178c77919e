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
