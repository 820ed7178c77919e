"""WSOL localization metrics: MaxBoxAcc / CorLoc / top-1/top-5 loc / PxAP.

Parity target: /root/reference/dlib/metrics/wsol_metrics.py —
- per-threshold boxes from the uint8-rendered scoremap via cv2 threshold
  (strict >) + contours + bounding rects, single-largest or multi-contour
  (:127-197);
- +1-pixel IoU matrix, degenerate pairs -> 0 (:77-124);
- BoxEvaluator: per IoU in {30, 50, 70}, per tau: count images whose best
  box IoU >= sigma; MaxBoxAcc = max over tau; plus top-1/top-5
  correct-class-and-localized curves (:266-433);
- MaskEvaluator PxAP over threshold histograms (:484-584).

This host implementation is the exact-protocol scorer (cv2 semantics are
the published benchmark); the batched on-device CAM forward feeds it, and
metrics/device_eval.py provides the all-on-TPU fast path used during
training-time validation.

Distributed: counters are plain numpy; `reduce_across_devices` sums them
with jax.psum-backed all-reduce when running under a mesh, replacing the
reference's all_gather helper (/root/reference/dlib/parallel/__init__.py).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from tcam_wsol_video_tpu.ops.boxes import iou_matrix_np

_CONTOUR_INDEX = 1 if cv2.__version__.split(".")[0] == "3" else 0


def scoremap_to_boxes(scoremap: np.ndarray, taus: Sequence[float],
                      multi_contour: bool = False
                      ) -> Tuple[List[np.ndarray], List[int]]:
    """Boxes per threshold.  scoremap: (H, W) float in [0, 1].

    Follows the benchmark exactly: render to uint8, threshold at
    int(tau * max) with strict >, outer+inner contours (RETR_TREE),
    boundingRect per contour, clamp x1/y1 to W-1/H-1; empty threshold ->
    one [0,0,0,0] box.
    """
    assert scoremap.ndim == 2
    assert not np.isnan(scoremap).any()
    assert scoremap.min() >= 0 and scoremap.max() <= 1, (
        scoremap.min(), scoremap.max())
    h, w = scoremap.shape
    img8 = np.expand_dims((scoremap * 255).astype(np.uint8), 2)
    peak = int(img8.max())

    boxes_per_tau: List[np.ndarray] = []
    counts: List[int] = []
    for tau in taus:
        _, binary = cv2.threshold(img8, int(tau * peak), 255,
                                  cv2.THRESH_BINARY)
        contours = cv2.findContours(binary, cv2.RETR_TREE,
                                    cv2.CHAIN_APPROX_SIMPLE)[_CONTOUR_INDEX]
        if len(contours) == 0:
            boxes_per_tau.append(np.zeros((1, 4), np.float64))
            counts.append(1)
            continue
        if not multi_contour:
            contours = [max(contours, key=cv2.contourArea)]
        rects = []
        for cont in contours:
            x, y, bw, bh = cv2.boundingRect(cont)
            rects.append([x, y, min(x + bw, w - 1), min(y + bh, h - 1)])
        boxes_per_tau.append(np.asarray(rects, np.float64))
        counts.append(len(rects))
    return boxes_per_tau, counts


class BoxEvaluator:
    """Accumulate per-image scoremaps against GT boxes; compute() returns
    MaxBoxAcc per IoU threshold (percent) and records the curves."""

    def __init__(self, cam_threshold_list: Sequence[float],
                 iou_threshold_list: Sequence[int] = (30, 50, 70),
                 multi_contour_eval: bool = True):
        self.cam_threshold_list = list(cam_threshold_list)
        self.iou_threshold_list = list(iou_threshold_list)
        self.multi_contour_eval = multi_contour_eval
        n_tau = len(self.cam_threshold_list)
        self.num_correct = {s: np.zeros(n_tau) for s in iou_threshold_list}
        self.num_correct_top1 = {s: np.zeros(n_tau)
                                 for s in iou_threshold_list}
        self.num_correct_top5 = {s: np.zeros(n_tau)
                                 for s in iou_threshold_list}
        self.cnt = 0
        self.best_tau_list: List[float] = []
        self.curves: Dict = {}

    def accumulate(self, scoremap: Optional[np.ndarray],
                   gt_boxes: np.ndarray, target: int,
                   preds_ordered: np.ndarray,
                   bbox: Optional[Sequence[float]] = None,
                   bbox_status: Optional[float] = None,
                   precomputed=None) -> None:
        """One image.  gt_boxes: (G, 4) x0y0x1y1 at eval resolution.
        `bbox`/`bbox_status` cover the C_BOX path where the box is
        predicted directly (reference :295-340): an invalid box counts as
        a miss at every tau.  `precomputed` accepts the
        scoremap_to_boxes result when the sweep ran in a worker thread."""
        if precomputed is not None:
            boxes_per_tau, counts = precomputed
            self._accumulate_boxes(boxes_per_tau, counts, gt_boxes, target,
                                   preds_ordered)
            return
        if scoremap is None:
            assert bbox is not None and bbox_status in (0, 1)
            if bbox_status == 0:
                self.cnt += 1
                return
            boxes_per_tau = [np.asarray([bbox], np.float64)
                             ] * len(self.cam_threshold_list)
            counts = [1] * len(self.cam_threshold_list)
        else:
            boxes_per_tau, counts = scoremap_to_boxes(
                scoremap, self.cam_threshold_list, self.multi_contour_eval)

        self._accumulate_boxes(boxes_per_tau, counts, gt_boxes, target,
                               preds_ordered)

    def _accumulate_boxes(self, boxes_per_tau, counts, gt_boxes, target,
                          preds_ordered) -> None:
        all_boxes = np.concatenate(boxes_per_tau, axis=0)
        iou = iou_matrix_np(all_boxes, np.asarray(gt_boxes, np.float64))
        best_per_box = iou.max(axis=1)
        # best IoU among this tau's boxes
        per_tau = np.maximum.reduceat(
            best_per_box, np.concatenate([[0], np.cumsum(counts)[:-1]]))
        self.accumulate_best_iou(per_tau, target, preds_ordered)

    def accumulate_level_hits(self, level_hits: np.ndarray, peak: int,
                              target: int,
                              preds_ordered: np.ndarray) -> None:
        """One image from the on-device exact sweep
        (metrics/device_sweep.level_hits): level_hits (256, S) bool with
        S ordered like iou_threshold_list; peak = the uint8-rendered
        scoremap's max.  Each tau maps to its threshold level with the
        protocol's own ``int(tau * peak)`` truncation
        (reference wsol_metrics.py:158: cv2.threshold at
        ``int(tau * max)``), so the counters are bit-equal to the cv2
        sweep's."""
        levels = (np.asarray(self.cam_threshold_list, np.float64)
                  * int(peak)).astype(np.int64)
        np.clip(levels, 0, 255, out=levels)
        hits = level_hits[levels]                       # (n_tau, S)
        top1_hit = target == preds_ordered[0]
        top5_hit = target in preds_ordered[:5]
        for si, sigma in enumerate(self.iou_threshold_list):
            h = hits[:, si].astype(np.float64)
            self.num_correct[sigma] += h
            if top1_hit:
                self.num_correct_top1[sigma] += h
            if top5_hit:
                self.num_correct_top5[sigma] += h
        self.cnt += 1

    def accumulate_best_iou(self, per_tau: np.ndarray, target: int,
                            preds_ordered: np.ndarray) -> None:
        """One image, given its per-tau best-IoU vector (e.g. from the
        native all-threshold sweep, metrics/native_sweep.py)."""
        top1_hit = target == preds_ordered[0]
        top5_hit = target in preds_ordered[:5]
        for sigma in self.iou_threshold_list:
            hit = per_tau >= sigma / 100.0
            self.num_correct[sigma] += hit
            if top1_hit:
                self.num_correct_top1[sigma] += hit
            if top5_hit:
                self.num_correct_top5[sigma] += hit
        self.cnt += 1

    def reduce_across_devices(self, all_reduce_fn=None) -> None:
        """Sum counters across data-parallel hosts.  all_reduce_fn:
        (np.ndarray) -> np.ndarray summing over the mesh; None = no-op
        (single process)."""
        if all_reduce_fn is None:
            return
        for tracker in (self.num_correct, self.num_correct_top1,
                        self.num_correct_top5):
            for k in tracker:
                tracker[k] = np.asarray(all_reduce_fn(tracker[k]))
        self.cnt = int(all_reduce_fn(np.asarray([self.cnt], np.float64))[0])

    def compute(self) -> List[float]:
        assert self.cnt > 0
        max_box_acc = []
        self.best_tau_list = []
        self.curves = {"x": self.cam_threshold_list, "top1": {}, "top5": {}}
        self.top1, self.top5 = [], []
        for sigma in self.iou_threshold_list:
            acc = self.num_correct[sigma] * 100.0 / self.cnt
            max_box_acc.append(float(acc.max()))
            self.best_tau_list.append(
                float(self.cam_threshold_list[int(np.argmax(acc))]))
            self.curves[sigma] = acc
            acc1 = self.num_correct_top1[sigma] * 100.0 / self.cnt
            acc5 = self.num_correct_top5[sigma] * 100.0 / self.cnt
            self.top1.append(float(acc1.max()))
            self.top5.append(float(acc5.max()))
            self.curves["top1"][sigma] = acc1
            self.curves["top5"][sigma] = acc5
        return max_box_acc


class MaskEvaluator:
    """PxAP over GT masks (OpenImages), reference :484-584: histogram the
    scoremap values inside/outside the GT mask per threshold, then the
    area under the precision-recall curve."""

    def __init__(self, cam_threshold_list: Sequence[float]):
        self.cam_threshold_list = list(cam_threshold_list)
        # reference bin convention (wsol_metrics.py:494-498): thresholds
        # plus terminal edges [1.0, 2.0, 3.0] — the two extra bins catch
        # scores above the last threshold so their recall mass is
        # credited in the AP sum (dropping them undercounts AP by
        # recall(tau_last), caught by tests/test_golden_pxap.py)
        self.edges = np.append(np.asarray(self.cam_threshold_list),
                               [1.0, 2.0, 3.0])
        n = len(self.cam_threshold_list) + 2
        self.gt_true_hist = np.zeros(n)
        self.gt_false_hist = np.zeros(n)
        self.cnt = 0

    def accumulate(self, scoremap: np.ndarray, gt_mask: np.ndarray) -> None:
        gt = gt_mask > 0.5
        sm = scoremap.astype(np.float64)
        self.gt_true_hist += np.histogram(sm[gt], bins=self.edges)[0]
        self.gt_false_hist += np.histogram(sm[~gt], bins=self.edges)[0]
        self.cnt += 1

    def reduce_across_devices(self, all_reduce_fn=None) -> None:
        if all_reduce_fn is None:
            return
        self.gt_true_hist = np.asarray(all_reduce_fn(self.gt_true_hist))
        self.gt_false_hist = np.asarray(all_reduce_fn(self.gt_false_hist))

    def compute(self) -> float:
        """PxAP exactly as the reference (wsol_metrics.py:546-584):
        tp/fp tail-cumulated from the highest bin (descending-threshold
        order), AP = sum precision * recall increments."""
        n_true = self.gt_true_hist.sum()
        n_false = self.gt_false_hist.sum()
        tp = self.gt_true_hist[::-1].cumsum()
        fp = self.gt_false_hist[::-1].cumsum()
        nonzero = (tp + fp) != 0
        with np.errstate(invalid="ignore", divide="ignore"):
            precision = tp / (tp + fp)
        recall = tp / max(n_true, 1)
        if n_false == 0 and n_true == 0:
            return 0.0
        ap = float((precision[1:] * np.diff(recall))[nonzero[1:]].sum())
        return ap * 100.0


def classification_accuracy(preds: np.ndarray, targets: np.ndarray
                            ) -> float:
    return float((preds == targets).mean() * 100.0)
