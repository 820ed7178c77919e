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
    """cams: (B, H, W) in [0, 1]. Returns (B,) thresholds in [0, 255] over
    floor(cam*255), the convention of GetRoiSingleCam.get_thresh
    (/root/reference/dlib/cams/tcam_seeding.py:424-430)."""
    x = jnp.floor(cams * 255.0)
    return jax.vmap(otsu_threshold_255)(x)
