"""Bounding-box utilities: conventions, IoU, scoremap -> box sweeps.

Parity targets:
- x0y0x1y1 convention + validity checks
  (/root/reference/dlib/utils/wsol.py:28-63).
- +1-pixel-area IoU matrix
  (/root/reference/dlib/metrics/wsol_metrics.py:77-124).
- resize_bbox (/root/reference/dlib/utils/tools.py).
- the on-device threshold sweep replaces the per-tau cv2 loop
  (/root/reference/dlib/metrics/wsol_metrics.py:127-197) with a vectorized
  covering-box computation: because {cam >= tau} is monotone in tau, the
  bbox of all super-threshold pixels per tau falls out of row/column max
  profiles in O(T*(H+W)) instead of T full image passes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def check_box_convention(boxes: np.ndarray, convention: str = "x0y0x1y1"):
    assert convention == "x0y0x1y1"
    b = np.asarray(boxes)
    assert b.ndim == 2 and b.shape[1] == 4, b.shape
    assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all(), b


def resize_bbox(box, image_size, resize_size) -> Tuple[int, int, int, int]:
    """Scale a box from original image size (w, h) to resize_size (w', h').
    box: x0, y0, x1, y1.  Coordinates int()-truncate after scaling — the
    reference protocol's GT boxes are integer-valued
    (/root/reference/dlib/utils/tools.py:231-250, used by BoxEvaluator's
    _load_resized_boxes and the wsol_loader), which also makes the
    +1-pixel IoU arithmetic exactly representable in int32 on device
    (metrics/device_sweep.py relies on this)."""
    x0, y0, x1, y1 = (float(v) for v in box)
    w_ratio = resize_size[0] / float(image_size[0])
    h_ratio = resize_size[1] / float(image_size[1])
    return (int(x0 * w_ratio), int(y0 * h_ratio),
            int(x1 * w_ratio), int(y1 * h_ratio))


def iou_matrix_np(box_a: np.ndarray, box_b: np.ndarray) -> np.ndarray:
    """(num_a, 4) x (num_b, 4) -> (num_a, num_b) IoU with the reference's
    +1 pixel-area convention; degenerate pairs score 0."""
    a = np.asarray(box_a, dtype=np.float64)[:, None, :]   # (A, 1, 4)
    b = np.asarray(box_b, dtype=np.float64)[None, :, :]   # (1, B, 4)
    min_x = np.maximum(a[..., 0], b[..., 0])
    min_y = np.maximum(a[..., 1], b[..., 1])
    max_x = np.minimum(a[..., 2], b[..., 2])
    max_y = np.minimum(a[..., 3], b[..., 3])
    inter = np.maximum(0, max_x - min_x + 1) * np.maximum(0, max_y - min_y + 1)
    area_a = (a[..., 2] - a[..., 0] + 1) * (a[..., 3] - a[..., 1] + 1)
    area_b = (b[..., 2] - b[..., 0] + 1) * (b[..., 3] - b[..., 1] + 1)
    denom = area_a + area_b - inter
    bad = denom <= 0
    denom = np.where(bad, 1.0, denom)
    iou = inter / denom
    iou[bad] = 0.0
    return iou


def iou_matrix(box_a: jax.Array, box_b: jax.Array) -> jax.Array:
    """Device version of iou_matrix_np. (A, 4), (B, 4) -> (A, B)."""
    a = box_a[:, None, :].astype(jnp.float32)
    b = box_b[None, :, :].astype(jnp.float32)
    min_x = jnp.maximum(a[..., 0], b[..., 0])
    min_y = jnp.maximum(a[..., 1], b[..., 1])
    max_x = jnp.minimum(a[..., 2], b[..., 2])
    max_y = jnp.minimum(a[..., 3], b[..., 3])
    inter = (jnp.maximum(0.0, max_x - min_x + 1) *
             jnp.maximum(0.0, max_y - min_y + 1))
    area_a = (a[..., 2] - a[..., 0] + 1) * (a[..., 3] - a[..., 1] + 1)
    area_b = (b[..., 2] - b[..., 0] + 1) * (b[..., 3] - b[..., 1] + 1)
    denom = area_a + area_b - inter
    iou = inter / jnp.where(denom <= 0, 1.0, denom)
    return jnp.where(denom <= 0, 0.0, iou)


def mask_to_bbox(mask: jax.Array) -> jax.Array:
    """Covering bbox (x0, y0, x1, y1) of a binary (H, W) mask; all-zero
    masks give [0, 0, 0, 0] like the reference's empty-contour path."""
    h, w = mask.shape
    any_row = jnp.any(mask > 0, axis=1)
    any_col = jnp.any(mask > 0, axis=0)
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    y0 = jnp.min(jnp.where(any_row, rows, h))
    y1 = jnp.max(jnp.where(any_row, rows, -1))
    x0 = jnp.min(jnp.where(any_col, cols, w))
    x1 = jnp.max(jnp.where(any_col, cols, -1))
    empty = ~jnp.any(any_row)
    box = jnp.stack([x0, y0, x1, y1]).astype(jnp.float32)
    return jnp.where(empty, jnp.zeros(4, jnp.float32), box)


def sweep_covering_boxes(cam: jax.Array, taus: jax.Array) -> jax.Array:
    """For each threshold tau, the bbox covering {cam*255u >= tau*max} —
    the single-box analogue of compute_bboxes_from_scoremaps, fully
    vectorized on device.

    The reference thresholds the uint8 rendering of the cam:
    thr = int(tau * max((cam*255).astype(uint8))), keep pixels > thr
    (cv2.THRESH_BINARY is strict).  We reproduce that quantization.

    cam: (H, W) in [0, 1]; taus: (T,). Returns (T, 4) float boxes
    x0y0x1y1. Empty masks give [0,0,0,0]."""
    h, w = cam.shape
    q = jnp.floor(jnp.clip(cam, 0.0, 1.0) * 255.0)        # uint8 rendering
    m = jnp.max(q)
    thr = jnp.floor(taus * m)                              # (T,) int cutoffs
    row_max = jnp.max(q, axis=1)                           # (H,)
    col_max = jnp.max(q, axis=0)                           # (W,)
    rows = jnp.arange(h, dtype=jnp.int32)
    cols = jnp.arange(w, dtype=jnp.int32)
    # pixel kept iff q > thr  -> row kept iff row_max > thr
    row_on = row_max[None, :] > thr[:, None]               # (T, H)
    col_on = col_max[None, :] > thr[:, None]               # (T, W)
    y0 = jnp.min(jnp.where(row_on, rows[None, :], h), axis=1)
    y1 = jnp.max(jnp.where(row_on, rows[None, :], -1), axis=1)
    x0 = jnp.min(jnp.where(col_on, cols[None, :], w), axis=1)
    x1 = jnp.max(jnp.where(col_on, cols[None, :], -1), axis=1)
    # benchmark convention: boundingRect returns x+w (exclusive end),
    # clamped to width-1 (reference wsol_metrics.py:179-181)
    x1 = jnp.minimum(x1 + 1, w - 1)
    y1 = jnp.minimum(y1 + 1, h - 1)
    empty = ~jnp.any(row_on, axis=1)
    boxes = jnp.stack([x0, y0, x1, y1], axis=1).astype(jnp.float32)
    return jnp.where(empty[:, None], jnp.zeros_like(boxes), boxes)


def _largest_run(on: jax.Array) -> tuple:
    """Largest contiguous True-run per row of a (T, N) bool matrix.
    Returns (start, end) inclusive indices, (T,) each; empty rows give
    start=0, end=-1.  Vectorized: run length ending at i is
    i - last_false_at_or_before(i), computed with one cummax."""
    t, n = on.shape
    idx = jnp.arange(n, dtype=jnp.int32)
    last_false = jax.lax.cummax(
        jnp.where(on, jnp.int32(-1), idx[None, :]), axis=1)  # (T, N)
    runlen = idx[None, :] - last_false                       # 0 where off
    end = jnp.argmax(runlen, axis=1).astype(jnp.int32)       # first max
    length = jnp.max(runlen, axis=1)
    return end - length + 1, jnp.where(length > 0, end, -1)


def sweep_largest_run_boxes(cam: jax.Array, taus: jax.Array) -> jax.Array:
    """For each threshold, the bbox of the LARGEST contiguous run of
    super-threshold rows x columns — the dominant-component analogue of
    sweep_covering_boxes.  On single-blob maps it equals the covering
    box; with distractor blobs it tracks the benchmark's best-contour
    box (multi_contour_eval) far more closely than the covering box,
    which inflates over all components (measured: IoU-70 MaxBoxAcc gap
    vs the exact protocol on 100 multi-blob CAMs drops from 29 points to
    within the test bound — tests/test_metrics.py).  Same O(T*(H+W))
    profile math, still one fused device program."""
    h, w = cam.shape
    q = jnp.floor(jnp.clip(cam, 0.0, 1.0) * 255.0)
    m = jnp.max(q)
    thr = jnp.floor(taus * m)
    row_on = jnp.max(q, axis=1)[None, :] > thr[:, None]      # (T, H)
    col_on = jnp.max(q, axis=0)[None, :] > thr[:, None]      # (T, W)
    y0, y1 = _largest_run(row_on)
    x0, x1 = _largest_run(col_on)
    x1 = jnp.minimum(x1 + 1, w - 1)
    y1 = jnp.minimum(y1 + 1, h - 1)
    empty = ~jnp.any(row_on, axis=1)
    boxes = jnp.stack([x0, y0, x1, y1], axis=1).astype(jnp.float32)
    return jnp.where(empty[:, None], jnp.zeros_like(boxes), boxes)
