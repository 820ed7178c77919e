"""Batched Otsu thresholding on device.

The reference computes Otsu per sample with a torch reimplementation
(STOtsu, /root/reference/dlib/cams/core_seeding.py:23-58) over
floor(cam*255) integer values, with bins spanning [min, max] at unit width.
This version reproduces those semantics exactly but over a fixed 256-bin
histogram with bins outside [min, max] masked out, which makes it shape-
static and vmappable over the batch — one fused XLA program instead of a
python loop per image.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def otsu_threshold_255(x: jax.Array) -> jax.Array:
    """Otsu threshold of one map of integer-valued floats in [0, 255].

    x: (H, W) float, values assumed integral (e.g. floor(cam*255)).
    Returns the threshold as float (same convention as STOtsu: the left bin
    center of the argmax inter-class variance).  Degenerate maps
    (min == max) return min, mirroring STOtsu's bad_egg path.
    """
    v = x.reshape(-1)
    lo = jnp.min(v)
    hi = jnp.max(v)

    centers = jnp.arange(256, dtype=jnp.float32)
    idx = jnp.clip(v.astype(jnp.int32), 0, 255)
    hist = jnp.zeros((256,), jnp.float32).at[idx].add(1.0)
    # restrict to [lo, hi] (unit-width bins elsewhere hold zero weight
    # anyway, but masking keeps cumsums identical to the [lo, hi] range)
    in_range = (centers >= lo) & (centers <= hi)
    hist = jnp.where(in_range, hist, 0.0)

    w1 = jnp.cumsum(hist)
    w2 = jnp.cumsum(hist[::-1])[::-1]
    m1 = jnp.cumsum(hist * centers) / jnp.maximum(w1, 1e-12)
    m2 = (jnp.cumsum((hist * centers)[::-1]) /
          jnp.maximum(jnp.cumsum(hist[::-1]), 1e-12))[::-1]

    # candidate split after bin i: classes [lo..i] vs [i+1..hi]
    diff_sq = (m1[:-1] - m2[1:]) ** 2
    var12 = w1[:-1] * w2[1:] * diff_sq
    # only splits strictly inside [lo, hi) are valid candidates
    valid = (centers[:-1] >= lo) & (centers[:-1] < hi)
    var12 = jnp.where(valid, var12, -jnp.inf)
    t = centers[:-1][jnp.argmax(var12)]
    return jnp.where(lo == hi, lo, t)


def otsu_threshold_batch(cams: jax.Array) -> jax.Array:
    """cams: (B, H, W) in [0, 1]. Returns (B,) STOtsu thresholds in
    [0, 255] over floor(cam*255) — the stored-threshold convention of the
    CAM dump (/root/reference/dlib/learning/inference_wsol.py:1112-1117
    uses STOtsu)."""
    x = jnp.floor(cams * 255.0)
    return jax.vmap(otsu_threshold_255)(x)


def otsu_threshold_skimage255(x: jax.Array) -> jax.Array:
    """skimage.filters.threshold_otsu semantics: a FIXED 256-bin histogram
    spanning [min, max], threshold = the CENTER of the argmax
    inter-class-variance bin (a fractional value).

    This is the variant `GetRoiSingleCam.get_thresh` uses for ROI
    re-thresholding (/root/reference/dlib/cams/tcam_seeding.py:424-430
    imports skimage's threshold_otsu, :17) — NOT the unit-width-bin
    STOtsu above: on CAM-like maps the two pick different thresholds on
    essentially every draw and the resulting `cam*255 >= th` blobs differ
    on ~75% of draws (measured, tests/test_golden_roi.py pins ours to the
    reference class).

    x: (H, W) float with integer values in [0, 255] (floor(cam*255)).
    Degenerate maps (min == max) return 0.0 — get_thresh's early-out
    (tcam_seeding.py:426-428), which makes every pixel foreground.
    Bin membership uses exact integer arithmetic
    (k = (v-lo)*256 // span, right-inclusive last edge), equal to
    np.histogram's uniform-bin fast path up to its documented ~1-ulp
    edge ambiguity.
    """
    v = x.reshape(-1).astype(jnp.int32)
    lo = jnp.min(v)
    hi = jnp.max(v)
    span = jnp.maximum(hi - lo, 1)
    k = jnp.clip((v - lo) * 256 // span, 0, 255)
    hist = jnp.zeros((256,), jnp.float32).at[k].add(1.0)
    step = span.astype(jnp.float32) / 256.0
    centers = (lo.astype(jnp.float32)
               + (jnp.arange(256, dtype=jnp.float32) + 0.5) * step)
    # bin 0 holds lo and bin 255 holds hi, so w1/w2 are never zero
    w1 = jnp.cumsum(hist)
    w2 = jnp.cumsum(hist[::-1])[::-1]
    m1 = jnp.cumsum(hist * centers) / w1
    m2 = (jnp.cumsum((hist * centers)[::-1]) / jnp.cumsum(hist[::-1]))[::-1]
    var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    t = centers[:-1][jnp.argmax(var12)]
    return jnp.where(lo == hi, 0.0, t)
