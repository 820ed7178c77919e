"""All-on-device localization evaluation (fast path).

The reference's eval hot loop pushes one image at a time through the model
then runs ~250-1000 cv2 threshold+contour passes per image on the CPU
(/root/reference/dlib/learning/inference_wsol.py:328-374,
wsol_metrics.py:127-197).  On TPU we instead:

1. forward the whole batch through one jitted program,
2. for every threshold at once, compute the covering bbox of the
   super-threshold pixels from row/column max profiles (O(T*(H+W))),
3. IoU against (padded) GT boxes and psum the per-(sigma, tau) counters
   over the data-parallel mesh.

The per-threshold box is the largest contiguous run of super-threshold
rows x columns (ops/boxes.sweep_largest_run_boxes): exact on single
connected blobs and tracking the benchmark's best-contour box
(multi_contour_eval) closely on multi-blob maps (quantified bound:
tests/test_metrics.py::test_device_eval_tracks_host_on_multi_blob_cams).
This sweep is used for fast model selection during training — final
reported numbers come from metrics/wsol.py (exact cv2 protocol).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tcam_wsol_video_tpu.ops.boxes import (iou_matrix,
                                           sweep_largest_run_boxes)

Array = jax.Array


@partial(jax.jit, static_argnames=("n_sigma",))
def _counters_one(cam: Array, gt_boxes: Array, gt_valid: Array,
                  taus: Array, sigmas: Array, n_sigma: int) -> Array:
    """Per-image correctness counters.

    cam: (H, W) in [0, 1]; gt_boxes: (G, 4) padded; gt_valid: (G,) bool;
    taus: (T,); sigmas: (S,) fractions.  Returns (S, T) 0/1.
    """
    boxes = sweep_largest_run_boxes(cam, taus)           # (T, 4)
    iou = iou_matrix(boxes, gt_boxes)                    # (T, G)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    best = jnp.max(iou, axis=1)                          # (T,)
    return (best[None, :] >= sigmas[:, None]).astype(jnp.float32)


def batch_counters(cams: Array, gt_boxes: Array, gt_valid: Array,
                   taus: Array, sigmas: Array) -> Array:
    """cams: (B, H, W); gt_boxes: (B, G, 4); gt_valid: (B, G).
    Returns per-(sigma, tau) correct counts summed over the batch: (S, T).
    """
    f = jax.vmap(lambda c, b, v: _counters_one(
        c, b, v, taus, sigmas, sigmas.shape[0]))
    return jnp.sum(f(cams, gt_boxes, gt_valid), axis=0)


def max_box_acc(counters: Array, count: Array) -> Array:
    """(S, T) counters + scalar image count -> (S,) MaxBoxAcc percent."""
    return jnp.max(counters, axis=1) * 100.0 / count
