"""Golden ROI-extraction parity vs the reference's own GetRoiSingleCam.

The class is AST-extracted from
/root/reference/dlib/cams/tcam_seeding.py:316-430 together with its bbox
helpers (get_largest_bbox :34-55, compute_bboxes_from_scoremaps_ext_contours
+ box/scoremap checks from /root/reference/dlib/utils/wsol.py) and run
verbatim; only its third-party leaves are shimmed (skimage.measure.label ->
scipy.ndimage 4-connected labeling, skimage threshold_otsu -> the classic
256-bin np.histogram algorithm it wraps, np.float -> float for the
post-1.24-numpy `astype(np.float)` at :363).

Pinned quirks this suite established:
- GetRoiSingleCam re-thresholds with SKIMAGE Otsu (256 fixed bins,
  fractional bin-center threshold, tcam_seeding.py:17 + :424-430) — NOT
  the STOtsu unit-bin variant used for the STORED dump thresholds
  (inference_wsol.py:1112-1117); on CAM-like maps the two disagree on
  essentially every draw and the blobs differ ~75% of the time.
- An EMPTY selected region (reachable only via a stored threshold above
  the CAM max) yields bbox [0, 0, 0, 0] (cv2-empty-contour sentinel kept
  by get_largest_bbox's >=) and a ZERO bbox mask — not the full image.
- A CONSTANT cam thresholds at 0 (get_thresh :426-428), making every
  pixel foreground.
"""
import ast
from typing import Tuple, Union

import cv2
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage as ndi

torch = pytest.importorskip("torch")

from tcam_wsol_video_tpu.cams.roi import (roi_one_cam,  # noqa: E402
                                          roi_one_cam_np)
from tcam_wsol_video_tpu.core import constants  # noqa: E402

TCAM_SEEDING = "/root/reference/dlib/cams/tcam_seeding.py"
WSOL_UTILS = "/root/reference/dlib/utils/wsol.py"

_FOUR = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)


class _Measure:
    """skimage.measure shim: label(background=0, connectivity=1)."""

    @staticmethod
    def label(blobs, background=0, connectivity=1, return_num=False):
        assert background == 0 and connectivity == 1 and not return_num
        return ndi.label(np.asarray(blobs) > 0, structure=_FOUR)[0]


def _threshold_otsu(image, nbins=256):
    """The classic skimage.filters.threshold_otsu algorithm: np.histogram
    over `nbins` uniform bins spanning [min, max], return the center of
    the argmax inter-class-variance bin."""
    counts, bin_edges = np.histogram(np.asarray(image).ravel(), bins=nbins)
    centers = (bin_edges[:-1] + bin_edges[1:]) / 2.0
    counts = counts.astype(np.float64)
    w1 = np.cumsum(counts)
    w2 = np.cumsum(counts[::-1])[::-1]
    m1 = np.cumsum(counts * centers) / w1
    m2 = (np.cumsum((counts * centers)[::-1]) / np.cumsum(counts[::-1]))[::-1]
    var12 = w1[:-1] * w2[1:] * (m1[:-1] - m2[1:]) ** 2
    return centers[:-1][int(np.argmax(var12))]


class _NpProxy:
    """numpy with the removed `np.float` alias restored (reference :363)."""

    def __getattr__(self, name):
        if name == "float":
            return float
        return getattr(np, name)


class _RefConstants:
    ROI_ALL = "roi_all"
    ROI_H_DENSITY = "roi_high_density"
    ROI_LARGEST = "largest"
    ROI_SELECT = [ROI_ALL, ROI_H_DENSITY, ROI_LARGEST]


_TO_REF_METHOD = {
    constants.ROI_ALL: _RefConstants.ROI_ALL,
    constants.ROI_H_DENSITY: _RefConstants.ROI_H_DENSITY,
    constants.ROI_LARGEST: _RefConstants.ROI_LARGEST,
}


def _extract(path, class_names, func_names, ns):
    tree = ast.parse(open(path).read())
    keep = [n for n in tree.body
            if (isinstance(n, ast.ClassDef) and n.name in class_names)
            or (isinstance(n, ast.FunctionDef) and n.name in func_names)]
    assert len(keep) == len(class_names) + len(func_names), path
    exec(compile(ast.fix_missing_locations(  # noqa: S102
        ast.Module(body=keep, type_ignores=[])), path, "exec"), ns)


@pytest.fixture(scope="module")
def ref_get_roi():
    ns = {
        "torch": torch, "np": _NpProxy(), "cv2": cv2,
        "Tuple": Tuple, "Union": Union,
        "measure": _Measure, "threshold_otsu": _threshold_otsu,
        "constants": _RefConstants, "_CONTOUR_INDEX": 0,  # cv2 >= 4
    }
    _extract(WSOL_UTILS,
             [], ["compute_bboxes_from_scoremaps_ext_contours",
                  "check_scoremap_validity", "check_box_convention"], ns)
    _extract(TCAM_SEEDING, ["GetRoiSingleCam"], ["get_largest_bbox"], ns)
    return ns["GetRoiSingleCam"]


def _ref_roi(ref_cls, cam, method, p_min_area, thresh=None):
    getter = ref_cls(roi_method=_TO_REF_METHOD[method],
                     p_min_area_roi=p_min_area)
    roi, msk, bb = getter(torch.from_numpy(cam), thresh=thresh)
    return (roi.numpy().astype(np.int32), msk.numpy(),
            bb.numpy().reshape(4).astype(np.float32))


def _cam_like(rng, n_blobs, size=32):
    cam = rng.random((size, size)).astype(np.float32) * 0.25
    for _ in range(n_blobs):
        h = rng.integers(3, 10)
        w = rng.integers(3, 10)
        y = rng.integers(0, size - h)
        x = rng.integers(0, size - w)
        cam[y:y + h, x:x + w] = np.clip(
            0.45 + rng.random((h, w)).astype(np.float32) * 0.55, 0, 1)
    return cam


@pytest.mark.parametrize("method", [constants.ROI_ALL,
                                    constants.ROI_H_DENSITY,
                                    constants.ROI_LARGEST])
def test_roi_host_matches_reference_otsu_rethreshold(ref_get_roi, method):
    """thresh=None: skimage-Otsu re-threshold + selection + contour bbox
    + mask, value-for-value over multi-blob CAM-like maps."""
    rng = np.random.default_rng(11)
    for i in range(25):
        cam = _cam_like(rng, n_blobs=int(rng.integers(1, 5)))
        want_roi, want_msk, want_bb = _ref_roi(ref_get_roi, cam, method,
                                               p_min_area_roi_for(i))
        got_roi, got_msk, got_bb = roi_one_cam_np(cam, method,
                                                  p_min_area_roi_for(i))
        np.testing.assert_array_equal(got_roi, want_roi, err_msg=f"{i}")
        np.testing.assert_array_equal(got_msk, want_msk, err_msg=f"{i}")
        np.testing.assert_allclose(got_bb, want_bb, atol=0, err_msg=f"{i}")


def p_min_area_roi_for(i):
    # sweep the density->largest fallback trigger
    return (0.01, 0.05, 0.20)[i % 3]


@pytest.mark.parametrize("method", [constants.ROI_H_DENSITY,
                                    constants.ROI_LARGEST])
def test_roi_host_matches_reference_stored_thresh(ref_get_roi, method):
    """Stored-threshold path (thresh in [0,1], reference :338-342)."""
    rng = np.random.default_rng(5)
    for i, t in enumerate((0.1, 0.35, 0.6, 0.9)):
        cam = _cam_like(rng, n_blobs=2)
        want_roi, want_msk, want_bb = _ref_roi(ref_get_roi, cam, method,
                                               0.05, thresh=t)
        # ours takes the threshold in [0, 255]
        got_roi, got_msk, got_bb = roi_one_cam_np(cam, method, 0.05,
                                                  thresh=t * 255.0)
        np.testing.assert_array_equal(got_roi, want_roi, err_msg=f"{i}")
        np.testing.assert_array_equal(got_msk, want_msk, err_msg=f"{i}")
        np.testing.assert_allclose(got_bb, want_bb, atol=0, err_msg=f"{i}")


def test_roi_empty_region_is_zero_box_and_mask(ref_get_roi):
    """A stored threshold above the CAM max empties the blobs: the
    reference keeps cv2's [0,0,0,0] empty-contour sentinel and a zero
    mask (NOT the full image)."""
    rng = np.random.default_rng(3)
    cam = (rng.random((16, 16)) * 0.4).astype(np.float32)
    want_roi, want_msk, want_bb = _ref_roi(
        ref_get_roi, cam, constants.ROI_LARGEST, 0.05, thresh=0.9)
    assert want_roi.sum() == 0
    np.testing.assert_array_equal(want_bb, [0, 0, 0, 0])
    assert want_msk.sum() == 0
    got_roi, got_msk, got_bb = roi_one_cam_np(
        cam, constants.ROI_LARGEST, 0.05, thresh=0.9 * 255.0)
    np.testing.assert_array_equal(got_roi, want_roi)
    np.testing.assert_array_equal(got_msk, want_msk)
    np.testing.assert_allclose(got_bb, want_bb)
    # device path agrees
    d_roi, d_msk, d_bb = roi_one_cam(jnp.asarray(cam), constants.ROI_LARGEST,
                                     0.05, thresh=0.9 * 255.0)
    np.testing.assert_array_equal(np.asarray(d_roi), want_roi)
    np.testing.assert_array_equal(np.asarray(d_msk), want_msk)
    np.testing.assert_allclose(np.asarray(d_bb), want_bb)


def test_roi_constant_cam_thresholds_at_zero(ref_get_roi):
    """get_thresh returns 0 on a constant map -> all-foreground blobs and
    a full-image contour bbox."""
    cam = np.full((16, 16), 0.4, np.float32)
    want_roi, want_msk, want_bb = _ref_roi(ref_get_roi, cam,
                                           constants.ROI_LARGEST, 0.05)
    assert want_roi.sum() == 16 * 16
    got_roi, got_msk, got_bb = roi_one_cam_np(cam, constants.ROI_LARGEST,
                                              0.05)
    np.testing.assert_array_equal(got_roi, want_roi)
    np.testing.assert_array_equal(got_msk, want_msk)
    np.testing.assert_allclose(got_bb, want_bb)


def test_roi_device_matches_reference_on_otsu_path(ref_get_roi):
    """The jitted device path (exact-rational histogram binning) agrees
    with the reference end-to-end on multi-blob maps."""
    rng = np.random.default_rng(17)
    for method in (constants.ROI_H_DENSITY, constants.ROI_LARGEST):
        for i in range(8):
            cam = _cam_like(rng, n_blobs=int(rng.integers(1, 4)))
            want_roi, want_msk, want_bb = _ref_roi(ref_get_roi, cam,
                                                   method, 0.05)
            d_roi, d_msk, d_bb = roi_one_cam(jnp.asarray(cam), method, 0.05)
            np.testing.assert_array_equal(np.asarray(d_roi), want_roi,
                                          err_msg=f"{method}:{i}")
            np.testing.assert_array_equal(np.asarray(d_msk), want_msk,
                                          err_msg=f"{method}:{i}")
            np.testing.assert_allclose(np.asarray(d_bb), want_bb,
                                       atol=0, err_msg=f"{method}:{i}")


def test_skimage_otsu_differs_from_stotsu_on_cam_maps():
    """The quirk is real: the two Otsu variants pick different thresholds
    (and usually different blobs) on CAM-like maps — using STOtsu for ROI
    re-thresholding would NOT reproduce the reference."""
    from tcam_wsol_video_tpu.metrics.otsu_np import otsu_np, otsu_skimage_np
    rng = np.random.default_rng(29)
    th_diff = blob_diff = 0
    for _ in range(20):
        cam = _cam_like(rng, n_blobs=2)
        q = np.floor(cam * 255.0)
        t_sk, t_st = otsu_skimage_np(q), otsu_np(q)
        th_diff += (t_sk != t_st)
        blob_diff += not np.array_equal(cam * 255.0 >= t_sk,
                                        cam * 255.0 >= t_st)
    assert th_diff >= 15 and blob_diff >= 5, (th_diff, blob_diff)
