"""EXACT all-threshold protocol sweep on device.

The benchmark protocol quantizes every scoremap to uint8 before
thresholding (/root/reference/dlib/metrics/wsol_metrics.py:127-197:
``(scoremap * 255).astype(np.uint8)`` then ``cv2.threshold`` at
``int(tau * max)`` with strict >), so the ~1000-tau sweep collapses onto
at most 256 distinct binarizations.  This module computes, entirely on
the TPU, the per-level per-IoU-sigma hit bit the BoxEvaluator counters
need — the host reads back (B, 256, S) booleans plus the per-image uint8
peak instead of (B, H, W) CAMs, deleting the device->host readback and
the host contour sweep that bound protocol-complete evaluation.

Exactness (vs metrics/wsol.scoremap_to_boxes with multi_contour=True,
itself bit-equal to the cv2 protocol, and vs native/boxsweep.cpp whose
max-tree formulation is the spec):

- outer contours: 8-connected components of ``q > t``.  Per level, every
  pixel of a component ends up holding the component's bounding box by
  fixpoint propagation of (x0, y0, -x1, -y1) with a masked 3x3
  neighborhood min — a pure VPU stencil, warm-started from the previous
  level (masks are nested across levels, so converged state at level
  t+1 under-approximates level t's fixpoint and iteration counts stay
  small).  Box rendering matches cv2.boundingRect + the benchmark
  clamp: [x0, y0, min(x1+1, W-1), min(y1+1, H-1)].
- inner (hole) contours, which cv2.RETR_TREE also returns: 4-connected
  components of ``q <= t`` not touching the border, swept in ascending
  level order (the background mask grows with t); a hole's
  inner-contour boundingRect is its bbox dilated by 1 then clamped
  (boxsweep.cpp:168-201).
- empty level -> the protocol's single [0, 0, 0, 0] box (which CAN
  score against a GT box covering the origin — iou_matrix_np only
  zeroes pairs with union <= 0).
- IoU decisions are INTEGER: GT boxes are int-valued
  (ops/boxes.resize_bbox int()-truncates like the reference's
  dlib/utils/tools.py:250), predicted boxes are pixel coords, and the
  +1-pixel IoU test ``iou >= s/100`` is equivalent to
  ``100*inter >= s*union`` — all products < 2^31, so the device result
  is exactly the float64 host comparison (a rational p/q with q <= ~1e5
  can only straddle the f64 boundary of s/100 by >= 1/(100 q) >> f64
  rounding; equality at p/q == s/100 exactly agrees too).

The host side (metrics/wsol.BoxEvaluator.accumulate_level_hits) maps
each tau to its level with the protocol's own ``int(tau * peak)``
truncation and feeds the usual counters, so top1/top5 curves, best-tau
lists and MaxBoxAcc come out of the unchanged code path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_INF = jnp.int32(1 << 30)


def _shift2d(x: Array, dy: int, dx: int, fill, channels: bool) -> Array:
    """Shift image content by (dy, dx) — output pixel (y, x) holds input
    pixel (y - dy, x - dx) — filling vacated pixels.  Static pad+slice
    (no wraparound).  H/W are axes -3/-2 when `channels` (state arrays
    (..., H, W, C)), else -2/-1 (masks (..., H, W))."""
    hy = x.ndim - (3 if channels else 2)
    wx = hy + 1
    pad = [(0, 0)] * x.ndim
    pad[hy] = (max(dy, 0), max(-dy, 0))
    pad[wx] = (max(dx, 0), max(-dx, 0))
    xp = jnp.pad(x, pad, constant_values=fill)
    idx = [slice(None)] * x.ndim
    h, w = x.shape[hy], x.shape[wx]
    idx[hy] = slice(max(-dy, 0), max(-dy, 0) + h)
    idx[wx] = slice(max(-dx, 0), max(-dx, 0) + w)
    return xp[tuple(idx)]


_OFFS8 = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
          if (dy, dx) != (0, 0)]
_OFFS4 = [(-1, 0), (1, 0), (0, -1), (0, 1)]


def _propagate_fixpoint(state: Array, mask: Array, own: Array,
                        conn8: bool) -> Array:
    """Iterate masked neighborhood-min until convergence.

    state: (B, H, W, C) int32, every channel min-propagated (store
    negated values for max semantics); mask: (B, H, W) bool.  Pixels
    outside the mask are pinned to `own`.  The operator is monotone
    non-increasing and bounded, so the fixpoint exists and equals the
    per-component min over each channel (= the component bbox/flags).
    """
    offs = _OFFS8 if conn8 else _OFFS4
    # shifted masks are loop-invariant: compute once, reuse every sweep
    nb_masks = [_shift2d(mask, dy, dx, False, channels=False)
                for dy, dx in offs]

    def one_step(s):
        out = s
        for (dy, dx), nb_in in zip(offs, nb_masks):
            nb = _shift2d(s, dy, dx, _INF, channels=True)
            out = jnp.minimum(out, jnp.where(nb_in[..., None], nb, _INF))
        return jnp.where(mask[..., None], out, own)

    def cond(c):
        return c[1]

    def body(c):
        s, _ = c
        new = one_step(s)
        return new, jnp.any(new != s)

    state, _ = jax.lax.while_loop(cond, body, (state, jnp.bool_(True)))
    return state


def _hits_from_boxes(x0, y0, x1, y1, ok_px, gt, gt_valid, sigmas100):
    """ok_px: (B, H, W) pixels carrying a real box; boxes int32 arrays
    (B, H, W).  gt: (B, G, 4) int32; sigmas100: static tuple of ints.
    Returns (B, S) bool: any (box, valid gt) pair with
    100*inter >= s*union (union > 0), the integer form of the
    +1-pixel IoU >= s/100 test (ops/boxes.iou_matrix_np)."""
    gx0 = gt[:, None, None, :, 0]
    gy0 = gt[:, None, None, :, 1]
    gx1 = gt[:, None, None, :, 2]
    gy1 = gt[:, None, None, :, 3]
    iw = jnp.minimum(x1[..., None], gx1) - jnp.maximum(x0[..., None], gx0) + 1
    ih = jnp.minimum(y1[..., None], gy1) - jnp.maximum(y0[..., None], gy0) + 1
    inter = jnp.maximum(iw, 0) * jnp.maximum(ih, 0)
    area = (x1 - x0 + 1) * (y1 - y0 + 1)
    garea = (gx1 - gx0 + 1) * (gy1 - gy0 + 1)
    union = area[..., None] + garea - inter
    ok = (ok_px[..., None] & gt_valid[:, None, None, :] & (union > 0))
    hits = [jnp.any(ok & (100 * inter >= s * union), axis=(1, 2, 3))
            for s in sigmas100]
    return jnp.stack(hits, axis=-1)                     # (B, S)


def _empty_level_hits(gt, gt_valid, sigmas100):
    """The protocol's no-contour convention: one [0, 0, 0, 0] box."""
    b = gt.shape[0]
    z = jnp.zeros((b, 1, 1), jnp.int32)
    ok = jnp.ones((b, 1, 1), bool)
    return _hits_from_boxes(z, z, z, z, ok, gt, gt_valid,
                            sigmas100)                  # (B, S)


@partial(jax.jit, static_argnames=("sigmas100",))
def level_hits(q: Array, gt: Array, gt_valid: Array,
               sigmas100: tuple) -> tuple:
    """q: (B, H, W) uint8 rendered scoremaps; gt: (B, G, 4) int32;
    gt_valid: (B, G) bool; sigmas100: static tuple e.g. (30, 50, 70).

    Returns (hits, peak): hits (B, 256, S) bool — at threshold level t,
    does any protocol contour box (outer or hole) of ``q > t`` reach
    IoU >= s/100 against a valid GT box — and peak (B,) int32 = q.max()
    for the host's ``int(tau * peak)`` tau->level mapping.
    """
    b, h, w = q.shape
    qi = q.astype(jnp.int32)
    yy, xx = jnp.mgrid[0:h, 0:w]
    own_fg = jnp.broadcast_to(
        jnp.stack([xx, yy, -xx, -yy], axis=-1).astype(jnp.int32),
        (b, h, w, 4))
    on_border = ((xx == 0) | (yy == 0) | (xx == w - 1) | (yy == h - 1))
    own_bg = jnp.broadcast_to(
        jnp.concatenate(
            [jnp.stack([xx, yy, -xx, -yy], axis=-1),
             -on_border.astype(jnp.int32)[..., None]],
            axis=-1).astype(jnp.int32), (b, h, w, 5))

    def fg_body(carry, v):
        state, prev_mask = carry
        mask = qi >= v                       # level t = v-1: q > t
        state = jnp.where(prev_mask[..., None], state, own_fg)
        grew = jnp.any(mask & ~prev_mask)
        state = jax.lax.cond(
            grew,
            lambda s: _propagate_fixpoint(s, mask, own_fg, conn8=True),
            lambda s: s, state)
        x0 = state[..., 0]
        y0 = state[..., 1]
        x1 = jnp.minimum(-state[..., 2] + 1, w - 1)   # exclusive end,
        y1 = jnp.minimum(-state[..., 3] + 1, h - 1)   # clamped (cv2)
        hits = _hits_from_boxes(x0, y0, x1, y1, mask, gt, gt_valid,
                                sigmas100)
        return (state, mask), (hits, jnp.any(mask, axis=(1, 2)))

    (_, _), (fg_hits, fg_any) = jax.lax.scan(
        fg_body, (own_fg, jnp.zeros((b, h, w), bool)),
        jnp.arange(255, 0, -1))
    # fg_hits[i] is level t = 254 - i; flip to level-ascending order
    fg_hits = fg_hits[::-1]                              # (255, B, S)
    fg_any = fg_any[::-1]                                # (255, B)

    def bg_body(carry, v):
        state, prev_mask = carry
        mask = qi <= v                       # level t = v
        state = jnp.where(prev_mask[..., None], state, own_bg)
        grew = jnp.any(mask & ~prev_mask)
        state = jax.lax.cond(
            grew,
            lambda s: _propagate_fixpoint(s, mask, own_bg, conn8=False),
            lambda s: s, state)
        # hole = bg component not touching the border; its inner-contour
        # boundingRect is the bbox dilated by 1 (boxsweep.cpp:189-201)
        is_hole = mask & (state[..., 4] == 0)
        hx0 = state[..., 0] - 1
        hy0 = state[..., 1] - 1
        hx1 = jnp.minimum(-state[..., 2] + 2, w - 1)
        hy1 = jnp.minimum(-state[..., 3] + 2, h - 1)
        hits = _hits_from_boxes(hx0, hy0, hx1, hy1, is_hole, gt, gt_valid,
                                sigmas100)
        return (state, mask), hits

    (_, _), hole_hits = jax.lax.scan(
        bg_body, (own_bg, jnp.zeros((b, h, w), bool)), jnp.arange(256))
    # hole_hits[v] is already level t = v                  (256, B, S)

    empty = _empty_level_hits(gt, gt_valid, sigmas100)     # (B, S)
    # levels 0..254: fg boxes | holes where the fg mask is non-empty,
    # else the empty-level box; level 255 (q > 255) is always empty
    combined = jnp.where(fg_any[..., None], fg_hits | hole_hits[:255],
                         empty[None])
    hits = jnp.concatenate([combined, empty[None]], axis=0)  # (256, B, S)
    peak = jnp.max(qi, axis=(1, 2))
    return jnp.transpose(hits, (1, 0, 2)), peak


def render_uint8(cam: Array) -> Array:
    """Protocol rendering of a float scoremap in [0, 1]:
    ``(scoremap * 255).astype(np.uint8)`` truncates
    (wsol_metrics.py:155); uint16 eval_transfer packs k/255 as k*257
    exactly, so the integer unpack recovers k."""
    if cam.dtype == jnp.uint8:
        return cam
    if cam.dtype == jnp.uint16:
        return (cam.astype(jnp.int32) * 255 // 65535).astype(jnp.uint8)
    return (jnp.clip(cam, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def sweep_batch(cams: Array, gt_boxes: np.ndarray, gt_valid: np.ndarray,
                sigmas100) -> tuple:
    """Device entry point for the evaluator: cams is the (device) CAM
    batch in any eval_transfer dtype; gt_boxes/gt_valid host arrays.
    Returns DEVICE (hits, peak) — the caller reads them back (tiny)
    after dispatching the next batch's eval step."""
    q = render_uint8(cams)
    gt = jnp.asarray(np.asarray(gt_boxes, np.int64).astype(np.int32))
    gv = jnp.asarray(gt_valid)
    return level_hits(q, gt, gv, tuple(int(s) for s in sigmas100))
