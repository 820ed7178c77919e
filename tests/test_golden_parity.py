"""Golden parity against the reference benchmark implementation.

Loads `compute_bboxes_from_scoremaps` and `calculate_multiple_iou` from
/root/reference/dlib/metrics/wsol_metrics.py AT RUNTIME (extracted by
name with ast — the heavy dlib package itself is never imported) and
asserts our scoremap_to_boxes / BoxEvaluator produce IDENTICAL boxes,
box counts, and per-IoU per-tau counters on random scoremaps.  This
turns "follows the published protocol exactly" into a test.

Skipped when the reference checkout is absent.
"""
import ast
import os

import numpy as np
import pytest

from tcam_wsol_video_tpu.metrics.wsol import BoxEvaluator, scoremap_to_boxes

REF_FILE = "/root/reference/dlib/metrics/wsol_metrics.py"

pytestmark = pytest.mark.skipif(not os.path.isfile(REF_FILE),
                                reason="reference checkout not available")


def _load_reference_fns():
    """Extract the two pure cv2+numpy functions from the reference source
    without importing its torch-heavy package."""
    import cv2

    tree = ast.parse(open(REF_FILE).read())
    wanted = {"compute_bboxes_from_scoremaps", "calculate_multiple_iou"}
    module = ast.Module(
        body=[n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name in wanted],
        type_ignores=[])
    ns = {
        "np": np,
        "cv2": cv2,
        "_CONTOUR_INDEX": 1 if cv2.__version__.split(".")[0] == "3" else 0,
        # validation-only helpers; parity is about the box math
        "check_scoremap_validity": lambda *_: None,
        "check_box_convention": lambda *_: None,
        "Union": __import__("typing").Union,
        "List": __import__("typing").List,
        "Tuple": __import__("typing").Tuple,
        "Optional": __import__("typing").Optional,
    }
    exec(compile(module, REF_FILE, "exec"), ns)
    return ns["compute_bboxes_from_scoremaps"], ns["calculate_multiple_iou"]


def _random_scoremaps(n, size=56, seed=0):
    """Smooth multi-blob scoremaps in [0, 1] (CAM-like)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size]
    maps = []
    for _ in range(n):
        m = np.zeros((size, size), np.float64)
        for _ in range(rng.integers(1, 4)):
            cy, cx = rng.uniform(0, size, 2)
            s = rng.uniform(3, 14)
            a = rng.uniform(0.3, 1.0)
            m += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
        m -= m.min()
        m /= max(m.max(), 1e-12)
        maps.append(m.astype(np.float32))
    return maps


def test_scoremap_to_boxes_matches_reference_exactly():
    ref_boxes_fn, _ = _load_reference_fns()
    taus = list(np.arange(0.0, 1.0, 0.01))
    for sm in _random_scoremaps(50):
        for multi in (True, False):
            ours_boxes, ours_counts = scoremap_to_boxes(sm, taus, multi)
            ref_boxes, ref_counts = ref_boxes_fn(
                sm, taus, multi_contour_eval=multi)
            assert ours_counts == list(ref_counts)
            for ob, rb in zip(ours_boxes, ref_boxes):
                np.testing.assert_array_equal(np.asarray(ob, np.float64),
                                              np.asarray(rb, np.float64))


def test_box_evaluator_counters_match_reference_protocol():
    """Full counter parity: our BoxEvaluator vs the reference's
    accumulate logic (wsol_metrics.py:330-371) rebuilt verbatim from its
    own extracted functions."""
    ref_boxes_fn, ref_iou_fn = _load_reference_fns()
    rng = np.random.default_rng(1)
    taus = list(np.arange(0.0, 1.0, 0.02))
    iou_list = [30, 50, 70]
    size = 56

    ours = BoxEvaluator(taus, iou_list, multi_contour_eval=True)
    ref_correct = {s: np.zeros(len(taus)) for s in iou_list}
    ref_top1 = {s: np.zeros(len(taus)) for s in iou_list}
    ref_top5 = {s: np.zeros(len(taus)) for s in iou_list}

    for i, sm in enumerate(_random_scoremaps(50, size=size, seed=2)):
        n_gt = int(rng.integers(1, 3))
        gt = []
        for _ in range(n_gt):
            x0, y0 = rng.integers(0, size - 8, 2)
            gt.append([x0, y0,
                       int(rng.integers(x0 + 4, size)),
                       int(rng.integers(y0 + 4, size))])
        gt = np.asarray(gt, np.float64)
        target = int(rng.integers(0, 10))
        preds = rng.permutation(10)

        ours.accumulate(sm, gt, target, preds)

        # reference counting, verbatim protocol
        boxes_at_thr, n_box_list = ref_boxes_fn(sm, taus,
                                                multi_contour_eval=True)
        all_boxes = np.concatenate(boxes_at_thr, axis=0)
        multiple_iou = ref_iou_fn(np.array(all_boxes), np.array(gt))
        idx = 0
        sliced = []
        for nr in n_box_list:
            sliced.append(max(multiple_iou.max(1)[idx:idx + nr]))
            idx += nr
        for s in iou_list:
            hit = np.where(np.asarray(sliced) >= s / 100)[0]
            ref_correct[s][hit] += 1
            if target == preds[0]:
                ref_top1[s][hit] += 1
            if target in preds[:5]:
                ref_top5[s][hit] += 1

    for s in iou_list:
        np.testing.assert_array_equal(ours.num_correct[s], ref_correct[s])
        np.testing.assert_array_equal(ours.num_correct_top1[s], ref_top1[s])
        np.testing.assert_array_equal(ours.num_correct_top5[s], ref_top5[s])
