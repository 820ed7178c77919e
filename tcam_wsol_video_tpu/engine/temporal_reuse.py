"""Change-based inference for video streams (serving/demo path).

Consecutive frames of a shot are largely redundant; EVA^2 and CBinfer
(PAPERS.md) exploit this by recomputing vision networks only where the
input changed.  This module implements the batch-level variant that fits
the TPU execution model: instead of sparse per-pixel updates (scatter-
heavy, XLA-hostile), whole frames are skipped when their mean absolute
difference from the last *computed* frame of the same video falls below
a threshold, and the previous CAM is reused.  The jitted forward keeps
one static batch shape (skipped slots are compacted out and the compute
batch padded back to the compiled size).

This is an APPROXIMATE serving-path optimization: it is exposed on the
demo-video CLI (--reuse_threshold) and deliberately NOT on the
benchmark evaluator, whose protocol recomputes every frame
(/root/reference/dlib/learning/inference_wsol.py:432-457).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


class FrameReusePlanner:
    """Per-video last-computed-frame state + batch planning.

    threshold is on mean |raw_t - raw_last| in [0, 255] pixel units
    (e.g. 2.0 ~= imperceptible static-scene jitter).  threshold <= 0
    disables reuse (every frame computed).
    """

    def __init__(self, threshold: float):
        self.threshold = float(threshold)
        self._last_raw: Dict[str, np.ndarray] = {}
        self._last_cam: Dict[str, np.ndarray] = {}
        self.n_computed = 0
        self.n_reused = 0

    def plan(self, video_ids: List[str], raws: np.ndarray
             ) -> Tuple[List[int], List[Optional[str]]]:
        """For one ordered batch: returns (compute_rows, reuse_from)
        where compute_rows lists row indices that need the model and
        reuse_from[i] is the video id whose cached CAM serves row i
        (None for computed rows).  Rows of the same video inside one
        batch chain correctly: a computed row updates the reference
        frame for the rows after it."""
        compute_rows: List[int] = []
        reuse_from: List[Optional[str]] = [None] * len(video_ids)
        for i, (vid, raw) in enumerate(zip(video_ids, raws)):
            prev = self._last_raw.get(vid)
            if (self.threshold > 0.0 and prev is not None
                    and float(np.mean(np.abs(
                        raw.astype(np.float32)
                        - prev.astype(np.float32)))) < self.threshold):
                reuse_from[i] = vid
                self.n_reused += 1
            else:
                compute_rows.append(i)
                self._last_raw[vid] = np.asarray(raw)
                self.n_computed += 1
        return compute_rows, reuse_from

    def store_cam(self, vid: str, cam: np.ndarray) -> None:
        self._last_cam[vid] = np.asarray(cam)

    def cam_for(self, vid: str) -> np.ndarray:
        return self._last_cam[vid]

    @property
    def reuse_fraction(self) -> float:
        total = self.n_computed + self.n_reused
        return self.n_reused / total if total else 0.0

    def resolve_rows(self, video_ids: List[str],
                     compute_rows: List[int],
                     reuse_from: List[Optional[str]],
                     computed_cams: Optional[np.ndarray],
                     out: np.ndarray) -> None:
        """Fill `out[i]` for every row of one planned batch, walking rows
        IN ORDER so a reuse row chains off the last computed frame of its
        video *before* it — never a later computed frame of the same
        batch.  computed_cams[j] is the CAM of compute_rows[j]."""
        row_to_j = {row: j for j, row in enumerate(compute_rows)}
        for i, src in enumerate(reuse_from):
            if src is not None:
                out[i] = self.cam_for(src)
            else:
                out[i] = computed_cams[row_to_j[i]]
                self.store_cam(video_ids[i], out[i])
