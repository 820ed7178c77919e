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

Algorithm (the TPU shape of native/boxsweep.cpp's max-tree, whose
formulation is proven bit-equal to the cv2 protocol):

1. every threshold level's binary mask decomposes into HORIZONTAL RUNS
   (maximal in-mask intervals per row).  Natural CAMs have 1-3 runs per
   row; a static cap of `max_runs` slots per row covers them, and any
   (image, level) exceeding the cap raises a per-image FALLBACK flag —
   the evaluator host-sweeps exactly those images, so exactness never
   depends on the cap;
2. connected components live on the RUN GRAPH: runs in adjacent rows
   are connected iff their intervals overlap under the connectivity
   dilation (8-connected foreground: distance <= 1; 4-connected
   background/holes: true overlap).  Per-component bounding boxes are
   the fixpoint of min-relaxation of (x0, y, -x1, -y) over that graph,
   computed by alternating top->down / bottom->up row `lax.scan` sweeps
   (each sweep resolves any monotone-in-y path in ONE pass; a
   while_loop repeats down+up until unchanged, so zigzag components
   converge too — iterations = number of vertical direction changes,
   not the component diameter that made pixel-level stencil propagation
   O(H) per level).  All 255+256 levels of the whole batch relax as one
   vectorized (levels*batch, C, H, R) problem;
3. hole boxes (cv2.RETR_TREE inner contours) come from the background
   pass: 4-connected bg components not touching the border (border =
   row 0 / row H-1 / a run hitting column 0 or W-1), their bbox dilated
   by 1 then clamped (boxsweep.cpp:189-201);
4. empty level -> the protocol's single [0, 0, 0, 0] box (which CAN
   score against a GT box covering the origin — iou_matrix_np only
   zeroes pairs with union <= 0);
5. IoU decisions are INTEGER: GT boxes are int-valued
   (ops/boxes.resize_bbox int()-truncates like the reference's
   dlib/utils/tools.py:250), run boxes are pixel coords, and the
   +1-pixel IoU test ``iou >= s/100`` is equivalent to
   ``100*inter >= s*union`` — all products < 2^31, so the device result
   is exactly the float64 host comparison.

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


def _extract_runs(masks: Array, max_runs: int):
    """masks: (N, H, W) bool — N independent level-images.

    Returns (x0r, x1r, valid, overflow): run start/end columns per
    (N, H, max_runs) slot (slots fill left to right), slot validity,
    and per-N overflow (some row had more than max_runs runs)."""
    n, h, w = masks.shape
    left = jnp.pad(masks[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
    start = masks & ~left
    # run index per pixel; counts stay < 128 (<= ceil(W/2) runs/row)
    sid = (jnp.cumsum(start.astype(jnp.int16), axis=-1) - 1)
    overflow = jnp.any((sid >= max_runs) & masks, axis=(1, 2))
    xs = jnp.arange(w, dtype=jnp.int32)
    x0r, x1r = [], []
    for r in range(max_runs):
        sel = masks & (sid == r)
        x0r.append(jnp.min(jnp.where(sel, xs, _INF), axis=-1))
        x1r.append(jnp.max(jnp.where(sel, xs, -1), axis=-1))
    x0r = jnp.stack(x0r, axis=-1)                   # (N, H, R)
    x1r = jnp.stack(x1r, axis=-1)
    valid = x1r >= 0
    return x0r, x1r, valid, overflow


def _interval_cc(x0r: Array, x1r: Array, valid: Array, dilate: int,
                 border: Array | None = None) -> Array:
    """Fixpoint min-relaxation of per-run state over the run graph.

    State channels: (x0, y, -x1, -y[, -border]).  At the fixpoint every
    run of a component holds the component-wide mins, i.e. the component
    bbox (and whether any of its runs touches the border).  Returns
    state (N, C, H, R)."""
    n, h, r = x0r.shape
    ys = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32)[None, :, None],
                          (n, h, r))
    chans = [jnp.where(valid, x0r, _INF), jnp.where(valid, ys, _INF),
             jnp.where(valid, -x1r, _INF), jnp.where(valid, -ys, _INF)]
    if border is not None:
        chans.append(jnp.where(valid, -border.astype(jnp.int32), _INF))
    state = jnp.stack(chans, axis=1)                # (N, C, H, R)

    # static adjacency: run i in row y ~ run j in row y-1 iff dilated
    # intervals overlap (8-conn: dilate 1; 4-conn: dilate 0)
    a0 = x0r - dilate
    a1 = x1r + dilate

    def _adj(nb_x0, nb_x1, nb_valid):
        return (valid[..., :, None] & nb_valid[..., None, :]
                & (a0[..., :, None] <= nb_x1[..., None, :])
                & (a1[..., :, None] >= nb_x0[..., None, :]))

    pad_row = ((0, 0), (1, 0), (0, 0))
    up_x0 = jnp.pad(x0r[:, :-1], pad_row, constant_values=0)
    up_x1 = jnp.pad(x1r[:, :-1], pad_row, constant_values=-1)
    up_v = jnp.pad(valid[:, :-1], pad_row)
    ov_up = _adj(up_x0, up_x1, up_v)                # (N, H, R, R)

    # scan layout: rows leading
    st_rows = jnp.moveaxis(state, 2, 0)             # (H, N, C, R)
    ovu_rows = jnp.moveaxis(ov_up, 1, 0)            # (H, N, R, R)

    def down(st):
        def step(carry, xs_):
            row, ovu = xs_                          # (N,C,R), (N,R,R)
            # ovu[n, i, j]: row y run i ~ row y-1 run j; carry holds
            # the resolved row above, indexed by j (last axis)
            nb = jnp.where(ovu[:, None], carry[:, :, None, :], _INF)
            new = jnp.minimum(row, jnp.min(nb, axis=-1))
            return new, new
        _, rows = jax.lax.scan(step, st[0], (st[1:], ovu_rows[1:]))
        return jnp.concatenate([st[:1], rows], axis=0)

    def up_sweep(st):
        def step(carry, xs_):
            row, ovu_next = xs_                     # (N,C,R), (N,R,R)
            # ovu_next[n, j, i]: row y+1 run j ~ row y run i
            nb = jnp.where(ovu_next[:, None], carry[:, :, :, None],
                           _INF)                    # (N, C, R_j, R_i)
            new = jnp.minimum(row, jnp.min(nb, axis=2))
            return new, new
        _, rows = jax.lax.scan(
            step, st[-1], (st[:-1][::-1], ovu_rows[1:][::-1]))
        return jnp.concatenate([rows[::-1], st[-1:]], axis=0)

    def cond(c):
        return c[1]

    def body(c):
        st, _ = c
        new = up_sweep(down(st))
        return new, jnp.any(new != st)

    st_rows, _ = jax.lax.while_loop(cond, body,
                                    (st_rows, jnp.bool_(True)))
    return jnp.moveaxis(st_rows, 0, 2)              # (N, C, H, R)


def _hits_from_runs(x0, y0, x1, y1, ok, gt, gt_valid, sigmas100):
    """Run-node boxes (N, H, R) int32 + ok (N, H, R) against GT
    (N, G, 4) int32: (N, S) bool — any (box, valid gt) pair with
    100*inter >= s*union and union > 0 (integer +1-pixel IoU test,
    ops/boxes.iou_matrix_np semantics)."""
    gx0 = gt[:, None, None, :, 0]
    gy0 = gt[:, None, None, :, 1]
    gx1 = gt[:, None, None, :, 2]
    gy1 = gt[:, None, None, :, 3]
    x0 = x0[..., None]
    y0 = y0[..., None]
    x1 = x1[..., None]
    y1 = y1[..., None]
    iw = jnp.minimum(x1, gx1) - jnp.maximum(x0, gx0) + 1
    ih = jnp.minimum(y1, gy1) - jnp.maximum(y0, gy0) + 1
    inter = jnp.maximum(iw, 0) * jnp.maximum(ih, 0)  # (N, H, R, G)
    area = (x1 - x0 + 1) * (y1 - y0 + 1)
    garea = (gx1 - gx0 + 1) * (gy1 - gy0 + 1)
    union = area + garea - inter
    okg = ok[..., None] & gt_valid[:, None, None, :] & (union > 0)
    hits = [jnp.any(okg & (100 * inter >= s * union), axis=(1, 2, 3))
            for s in sigmas100]
    return jnp.stack(hits, axis=-1)                 # (N, S)


def _empty_level_hits(gt, gt_valid, sigmas100):
    """The protocol's no-contour convention: one [0, 0, 0, 0] box."""
    b = gt.shape[0]
    z = jnp.zeros((b, 1, 1), jnp.int32)
    ok = jnp.ones((b, 1, 1), bool)
    return _hits_from_runs(z, z, z, z, ok, gt, gt_valid, sigmas100)


@partial(jax.jit, static_argnames=("sigmas100", "max_runs"))
def level_hits(q: Array, gt: Array, gt_valid: Array, sigmas100: tuple,
               max_runs: int = 8) -> tuple:
    """q: (B, H, W) uint8 rendered scoremaps; gt: (B, G, 4) int32;
    gt_valid: (B, G) bool; sigmas100: static tuple e.g. (30, 50, 70).

    Returns (hits, peak, fallback):
      hits (B, 256, S) bool — at threshold level t, does any protocol
        contour box (outer or hole) of ``q > t`` reach IoU >= s/100
        against a valid GT box;
      peak (B,) int32 = q.max() for the host's ``int(tau * peak)``
        tau->level mapping;
      fallback (B,) bool — some level of this image exceeded max_runs
        runs in a row; its hits are NOT exact and the caller must sweep
        that image on the host.
    """
    b, h, w = q.shape
    qi = q.astype(jnp.int32)
    levels = jnp.arange(255, dtype=jnp.int32)

    # ---- foreground: masks q > t for t = 0..254, 8-connected
    fg_masks = (qi[None] > levels[:, None, None, None])   # (255,B,H,W)
    fg_masks = fg_masks.reshape(255 * b, h, w)
    fx0, fx1, fvalid, f_over = _extract_runs(fg_masks, max_runs)
    fstate = _interval_cc(fx0, fx1, fvalid, dilate=1)
    # component boxes, cv2.boundingRect + benchmark clamp
    cx0 = fstate[:, 0]
    cy0 = fstate[:, 1]
    cx1 = jnp.minimum(-fstate[:, 2] + 1, w - 1)
    cy1 = jnp.minimum(-fstate[:, 3] + 1, h - 1)
    gt_rep = jnp.broadcast_to(gt[None], (255,) + gt.shape
                              ).reshape(255 * b, *gt.shape[1:])
    gv_rep = jnp.broadcast_to(gt_valid[None], (255,) + gt_valid.shape
                              ).reshape(255 * b, gt_valid.shape[1])
    fg_hits = _hits_from_runs(cx0, cy0, cx1, cy1, fvalid, gt_rep,
                              gv_rep, sigmas100)          # (255*B, S)
    fg_any = jnp.any(fvalid, axis=(1, 2))                 # (255*B,)

    # ---- background/holes: masks q <= t for t = 0..255, 4-connected
    levels_bg = jnp.arange(256, dtype=jnp.int32)
    bg_masks = (qi[None] <= levels_bg[:, None, None, None])
    bg_masks = bg_masks.reshape(256 * b, h, w)
    bx0, bx1, bvalid, b_over = _extract_runs(bg_masks, max_runs)
    ys = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    bborder = ((ys == 0) | (ys == h - 1) | (bx0 == 0)
               | (bx1 == w - 1)) & bvalid
    bstate = _interval_cc(bx0, bx1, bvalid, dilate=0, border=bborder)
    is_hole = bvalid & (bstate[:, 4] == 0)
    # inner-contour boundingRect = hole bbox dilated by 1, clamped
    hx0 = bstate[:, 0] - 1
    hy0 = bstate[:, 1] - 1
    hx1 = jnp.minimum(-bstate[:, 2] + 2, w - 1)
    hy1 = jnp.minimum(-bstate[:, 3] + 2, h - 1)
    gt_rep6 = jnp.broadcast_to(gt[None], (256,) + gt.shape
                               ).reshape(256 * b, *gt.shape[1:])
    gv_rep6 = jnp.broadcast_to(gt_valid[None], (256,) + gt_valid.shape
                               ).reshape(256 * b, gt_valid.shape[1])
    hole_hits = _hits_from_runs(hx0, hy0, hx1, hy1, is_hole, gt_rep6,
                                gv_rep6, sigmas100)       # (256*B, S)

    s = len(sigmas100)
    fg_hits = fg_hits.reshape(255, b, s)
    fg_any = fg_any.reshape(255, b)
    hole_hits = hole_hits.reshape(256, b, s)

    empty = _empty_level_hits(gt, gt_valid, sigmas100)    # (B, S)
    # levels 0..254: fg boxes | holes where the fg mask is non-empty,
    # else the empty-level box; level 255 (q > 255) is always empty
    combined = jnp.where(fg_any[..., None], fg_hits | hole_hits[:255],
                         empty[None])
    hits = jnp.concatenate([combined, empty[None]], axis=0)
    peak = jnp.max(qi, axis=(1, 2))
    fallback = (jnp.any(f_over.reshape(255, b), axis=0)
                | jnp.any(b_over.reshape(256, b), axis=0))
    return jnp.transpose(hits, (1, 0, 2)), peak, fallback


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
                sigmas100, max_runs: int = 8) -> tuple:
    """Device entry point for the evaluator: cams is the (device) CAM
    batch in any eval_transfer dtype; gt_boxes/gt_valid host arrays.
    Returns DEVICE (hits, peak, fallback) — the caller reads them back
    (tiny) after dispatching the next batch's eval step, and host-sweeps
    any image whose fallback bit is set."""
    q = render_uint8(cams)
    gt = jnp.asarray(np.asarray(gt_boxes, np.int64).astype(np.int32))
    gv = jnp.asarray(gt_valid)
    return level_hits(q, gt, gv, tuple(int(s) for s in sigmas100),
                      max_runs=max_runs)
