"""ROI extraction from CAMs: Otsu threshold -> connected components ->
region selection -> largest-region bbox.

Parity target: GetRoiSingleCam
(/root/reference/dlib/cams/tcam_seeding.py:317-430), pinned value-for-value
by tests/test_golden_roi.py against the reference's own AST-extracted
class:
- threshold = SKIMAGE Otsu (256 fixed bins — NOT STOtsu's unit bins, see
  ops/otsu.otsu_threshold_skimage255) over floor(cam*255), 0 on constant
  maps; or a stored threshold;
- blobs = cam*255 >= threshold;
- ROI_ALL keeps all blobs; ROI_H_DENSITY keeps the densest component
  (cam mass / area) falling back to the largest when it is under
  p_min_area_roi of the image; ROI_LARGEST keeps the largest;
- bbox = largest-contour bounding box of the selected region with
  exclusive ends clamped to size-1 (reference :397-404 via cv2
  boundingRect); whole image for ROI_ALL; an EMPTY region yields the
  cv2-empty-contour sentinel [0, 0, 0, 0] and a zero mask (reference
  wsol.py:126-127 + get_largest_bbox's >= keeping it) — NOT the full
  image;
- mask filled with the exclusive-end convention
  bbox_mask[y0:y1, x0:x1] = 1 (reference :416-419).

Square-map note: the reference's ROI_ALL / early bboxes are
np.array([0, 0, h-1, w-1]) in x0y0x1y1 order (:349, :404) — h and w
swapped for non-square maps; all recipe crops are square, where the two
agree, and we keep the sane [0, 0, w-1, h-1].

Device path: batched/jittable using the on-device Otsu + label propagation;
host path: exact scipy labeling for the offline ROI builder and tests.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tcam_wsol_video_tpu.core import constants
from tcam_wsol_video_tpu.ops.boxes import mask_to_bbox
from tcam_wsol_video_tpu.ops.connected_components import (component_stats,
                                                          label_jax, label_np)
from tcam_wsol_video_tpu.ops.otsu import otsu_threshold_skimage255

Array = jax.Array


def _bbox_mask_exclusive(h: int, w: int, box: Array) -> Array:
    """mask[y0:y1, x0:x1] = 1 (exclusive ends, like numpy slicing)."""
    x0, y0, x1, y1 = box[0], box[1], box[2], box[3]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    return ((ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
            ).astype(jnp.float32)


def roi_one_cam(cam: Array,
                roi_method: str = constants.ROI_ALL,
                p_min_area_roi: float = 0.05,
                thresh: Optional[Array] = None,
                max_components: int = 64,
                cc_iters: int = 128) -> Tuple[Array, Array, Array]:
    """Device ROI extraction for one (H, W) cam in [0, 1].

    thresh: optional stored threshold in [0, 255] (np.inf/None triggers
    Otsu re-thresholding, reference wsol_loader.py:573-580).
    Returns (roi int32 (H, W), bbox_mask float (H, W), bbox float (4,)).
    """
    h, w = cam.shape
    th = otsu_threshold_skimage255(jnp.floor(cam * 255.0)) \
        if thresh is None else jnp.asarray(thresh, jnp.float32)
    blobs = (cam * 255.0 >= th).astype(jnp.int32)

    if roi_method == constants.ROI_ALL:
        full_box = jnp.asarray([0.0, 0.0, w - 1.0, h - 1.0], jnp.float32)
        return blobs, _bbox_mask_exclusive(h, w, full_box), full_box

    lab = label_jax(blobs, num_iters=cc_iters)
    areas, masses, comp = component_stats(lab, cam,
                                          max_components=max_components)
    density = masses / jnp.maximum(areas, 1e-12)
    density = jnp.where(areas > 0, density, -jnp.inf)
    area_rank = jnp.where(areas > 0, areas, -jnp.inf)

    largest = jnp.argmax(area_rank)
    if roi_method == constants.ROI_H_DENSITY:
        densest = jnp.argmax(density)
        min_area = h * w * p_min_area_roi
        chosen = jnp.where(areas[densest] < min_area, largest, densest)
    elif roi_method == constants.ROI_LARGEST:
        chosen = largest
    else:  # pragma: no cover
        raise NotImplementedError(roi_method)

    n_comp = jnp.sum(areas > 0)
    roi = jnp.where(n_comp <= 1, blobs,
                    (comp == chosen).astype(jnp.int32))
    box = mask_to_bbox(roi)
    # contour convention: exclusive end clamped to the image
    # (reference largest-bbox path goes through boundingRect)
    box = box.at[2].set(jnp.minimum(box[2] + 1, w - 1))
    box = box.at[3].set(jnp.minimum(box[3] + 1, h - 1))
    # empty roi -> cv2's empty-contour sentinel [0,0,0,0] and a zero mask
    # (reference wsol.py:126-127; get_largest_bbox keeps it via >=)
    empty = jnp.sum(roi) == 0
    box = jnp.where(empty, jnp.zeros((4,), jnp.float32), box)
    return roi, _bbox_mask_exclusive(h, w, box), box


def roi_batch(cams: Array, roi_method: str = constants.ROI_ALL,
              p_min_area_roi: float = 0.05,
              threshs: Optional[Array] = None,
              max_components: int = 64,
              cc_iters: int = 128):
    """Batched device ROI extraction; cams (B, H, W)."""
    if threshs is None:
        fn = lambda c: roi_one_cam(  # noqa: E731
            c, roi_method, p_min_area_roi, None, max_components, cc_iters)
        return jax.vmap(fn)(cams)
    fn = lambda c, t: roi_one_cam(  # noqa: E731
        c, roi_method, p_min_area_roi, t, max_components, cc_iters)
    return jax.vmap(fn)(cams, threshs)


# ------------------------------------------------------------- host path
def roi_one_cam_np(cam: np.ndarray,
                   roi_method: str = constants.ROI_ALL,
                   p_min_area_roi: float = 0.05,
                   thresh: Optional[float] = None
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact host version (scipy labeling), same contract as roi_one_cam."""
    h, w = cam.shape
    if thresh is None:
        from tcam_wsol_video_tpu.metrics.otsu_np import otsu_skimage_np
        th = otsu_skimage_np(np.floor(cam * 255.0))
    else:
        th = float(thresh)
    blobs = (cam * 255.0 >= th).astype(np.int32)
    full_box = np.array([0.0, 0.0, w - 1.0, h - 1.0], np.float32)

    if roi_method == constants.ROI_ALL:
        roi = blobs
        box = full_box
    else:
        lab = label_np(blobs)
        ids = [l for l in np.unique(lab) if l != 0]
        if len(ids) <= 1:
            roi = blobs.astype(np.int32)
        else:
            areas = {l: float((lab == l).sum()) for l in ids}
            if roi_method == constants.ROI_H_DENSITY:
                dens = {l: float((cam * (lab == l)).sum()) / areas[l]
                        for l in ids}
                chosen = max(dens, key=dens.get)
                if areas[chosen] < h * w * p_min_area_roi:
                    chosen = max(areas, key=areas.get)
            else:
                chosen = max(areas, key=areas.get)
            roi = (lab == chosen).astype(np.int32)
        if roi.sum() == 0:
            box = np.zeros((4,), np.float32)
        else:
            ys, xs = np.nonzero(roi)
            box = np.array([xs.min(), ys.min(),
                            min(xs.max() + 1, w - 1),
                            min(ys.max() + 1, h - 1)], np.float32)

    x0, y0, x1, y1 = box.astype(int)
    mask = np.zeros((h, w), np.float32)
    mask[y0:y1, x0:x1] = 1.0
    return roi, mask, box
