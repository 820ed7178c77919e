"""Per-frame CAM store: stage-1 classifier CAMs consumed by TCAM training.

Parity target: the reference dumps per-frame low-resolution CAMs as .pt
files plus an Otsu ROI-threshold text file
(/root/reference/dlib/learning/inference_wsol.py:1073-1132
_build_store_std_cam_low) and the dataset reloads them per __getitem__
(wsol_loader.py:505-516, 585-601).

TPU-native: CAMs are stored as .npy (fast host mmap) mirroring the frame
id directory layout; thresholds live in one `roi_thresholds.txt` with
`id,threshold` lines, threshold in [0, 1] — the reference's file
convention (inference_wsol.py:1125 writes thresh/255; the loader hands
the [0,1] value to GetRoiSingleCam, which scales by 255).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


class CamStore:
    def __init__(self, root: str):
        self.root = root
        self._thresholds: Optional[Dict[str, float]] = None

    # ------------------------------------------------------------ write
    def save_cam(self, image_id: str, cam: np.ndarray) -> None:
        path = os.path.join(self.root, image_id + ".npy")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.save(path, cam.astype(np.float32))

    def save_thresholds(self, thresholds: Dict[str, float]) -> None:
        os.makedirs(self.root, exist_ok=True)
        with open(os.path.join(self.root, "roi_thresholds.txt"), "w") as f:
            for iid, th in thresholds.items():
                f.write(f"{iid},{th}\n")

    # ------------------------------------------------------------- read
    def has(self, image_id: str) -> bool:
        return os.path.isfile(os.path.join(self.root, image_id + ".npy"))

    def load_cam(self, image_id: str) -> np.ndarray:
        cam = np.load(os.path.join(self.root, image_id + ".npy"))
        assert cam.ndim == 2, cam.shape
        return cam

    @property
    def thresholds(self) -> Optional[Dict[str, float]]:
        if self._thresholds is None:
            path = os.path.join(self.root, "roi_thresholds.txt")
            if not os.path.isfile(path):
                return None
            out: Dict[str, float] = {}
            with open(path) as f:
                for ln in f:
                    ln = ln.strip()
                    if ln:
                        iid, th = ln.rsplit(",", 1)
                        out[iid] = float(th)
            self._thresholds = out
        return self._thresholds
