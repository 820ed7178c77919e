"""WSOL video dataset: shots, frames, temporal neighbors, CAM fusion, ROI.

Parity target: WSOLImageLabelDataset
(/root/reference/dlib/datasets/wsol_loader.py:207-694):
- shot-mode detection (train ids are shot directories, :375-394) and
  frame indexing per shot (:400-422);
- one random frame per shot per epoch (:524-554);
- temporal neighbors before/after (:447-458) for CAM fusion: stored
  classifier CAMs of the +-knn frames, heated with exp(cam*t)/max, fused
  by elementwise max (:585-601, 629-635);
- clip sampling (knn_tc > 0): the 2k+1 neighboring frames of a random
  anchor are all returned (:479-503) — our pipeline lays them out
  clip-major contiguous in the batch (the static-shape analogue of
  _temporal_default_collate :881-900);
- joint transforms on (image, raw, cam); ROI from the fused CAM via
  stored threshold or Otsu (:609-613);
- `fill minibatch` padding is handled by the pipeline, not here.

Host-side, replayable: every random choice derives from the KeyChain via
(epoch, split, index) so distributed workers sample identically.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from tcam_wsol_video_tpu.cams.roi import roi_one_cam_np
from tcam_wsol_video_tpu.cams.temporal import DecayTemp
from tcam_wsol_video_tpu.core import constants
from tcam_wsol_video_tpu.core.prng import KeyChain
from tcam_wsol_video_tpu.data.cam_store import CamStore
from tcam_wsol_video_tpu.data.folds import SplitMetadata, resized_gt_boxes
from tcam_wsol_video_tpu.data.transforms import PairedTransform


def heat_cam_np(cam: np.ndarray, t: float) -> np.ndarray:
    """Reference form exp((cam+1e-6)*t) / max with nan/posinf guards
    (wsol_loader.py:629-635).  When the peak would overflow, the
    reference's guard maps EVERY pixel to 0 (inf/inf -> nan -> 0,
    finite/inf -> 0); reproduce that by checking only the scalar peak so
    the array exp never overflows (no RuntimeWarning per batch)."""
    x = (cam + 1e-6) * t
    with np.errstate(over="ignore"):
        peak = np.exp(x.max())
    if not np.isfinite(peak):
        return np.zeros_like(cam)
    e = np.exp(x)
    e = e / max(e.max(), 1e-30)
    return np.nan_to_num(e, nan=0.0, posinf=1.0, neginf=0.0)


class WSOLVideoDataset:
    def __init__(self,
                 metadata: SplitMetadata,
                 data_root: str,
                 split: str,
                 dataset_name: str,
                 transform: PairedTransform,
                 keychain: KeyChain,
                 crop_size: int = constants.CROP_SIZE,
                 cam_store: Optional[CamStore] = None,
                 knn_tc: int = 0,
                 sl_tc_knn: int = 0,
                 sl_tc_knn_mode: str = constants.TIME_INSTANT,
                 decay_temp: Optional[DecayTemp] = None,
                 use_roi: bool = False,
                 roi_method: str = constants.ROI_ALL,
                 p_min_area_roi: float = 0.05):
        self.md = metadata
        self.data_root = data_root
        self.split = split
        self.dataset_name = dataset_name
        self.transform = transform
        self.kc = keychain
        self.crop_size = crop_size
        self.cam_store = cam_store
        self.knn_tc = knn_tc
        self.sl_tc_knn = sl_tc_knn
        self.sl_tc_knn_mode = sl_tc_knn_mode
        self.decay_temp = decay_temp
        self.use_roi = use_roi
        self.roi_method = roi_method
        self.p_min_area_roi = p_min_area_roi
        self.epoch = 0

        self.mode = self._detect_mode()
        self.index_of_frames: Dict[str, List[str]] = {}
        self.frame_to_shot: Dict[str, str] = {}
        if self.mode == constants.DS_SHOTS:
            self._index_frames()

    # ------------------------------------------------------------ setup
    def _detect_mode(self) -> str:
        if self.dataset_name not in constants.VIDEO_DATASETS:
            return constants.DS_FRAMES
        first = os.path.join(self.data_root, self.md.image_ids[0])
        if os.path.isdir(first):
            return constants.DS_SHOTS
        if os.path.isfile(first):
            return constants.DS_FRAMES
        raise FileNotFoundError(
            f"dataset id {self.md.image_ids[0]!r} resolves to neither a "
            f"shot dir nor a frame under {self.data_root!r}")

    def _index_frames(self) -> None:
        for shot in self.md.image_ids:
            shot_dir = os.path.join(self.data_root, shot)
            frames = sorted(f for f in os.listdir(shot_dir)
                            if f.endswith(".jpg"))
            assert frames, f"empty shot {shot}"
            rel = [f"{shot}/{f}" for f in frames]
            self.index_of_frames[shot] = rel
            for fr in rel:
                self.frame_to_shot[fr] = shot

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)
        if self.decay_temp is not None:
            self.decay_temp.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.md.image_ids)

    @property
    def clip_len(self) -> int:
        return 2 * self.knn_tc + 1 if self.knn_tc > 0 else 1

    # --------------------------------------------------------- neighbors
    def _neighbors(self, frames: List[str], frame: str, k: int):
        i = frames.index(frame)
        n = len(frames)
        left = frames[max(0, i - k):i]
        right = frames[min(i + 1, n - 1):min(i + k + 1, n)]
        return left, right

    def _temporal_frames(self, frame_id: str) -> List[str]:
        """Frames whose stored CAMs fuse into this frame's seed CAM."""
        k = self.sl_tc_knn
        mode = self.sl_tc_knn_mode
        if self.decay_temp is not None:
            mode = self.decay_temp.sl_tc_knn_mode
            k = self.decay_temp.sl_tc_knn
        if self.mode != constants.DS_SHOTS or k == 0:
            return [frame_id]
        shot = self.frame_to_shot[frame_id]
        frames = self.index_of_frames[shot]
        left, right = self._neighbors(frames, frame_id, k)
        out = []
        if mode in (constants.TIME_BEFORE, constants.TIME_BEFORE_AFTER):
            out += left
        out.append(frame_id)
        if mode in (constants.TIME_AFTER, constants.TIME_BEFORE_AFTER):
            out += right
        return out

    # ------------------------------------------------------------- items
    def sample_ids(self, idx: int) -> List[str]:
        """Resolve dataset index -> frame id(s) for this epoch (random
        frame per shot; clip of exactly 2k+1 frames when knn_tc > 0).

        Static-shape contract: the reference emits shorter clips at shot
        boundaries (wsol_loader.py:487-493) which torch collates
        dynamically; XLA needs fixed shapes, so the anchor is clamped
        into the interior when the shot is long enough, and short shots
        pad by repeating the last frame."""
        image_id = self.md.image_ids[idx]
        if self.mode != constants.DS_SHOTS:
            return [image_id]
        frames = self.index_of_frames[image_id]
        rng = self.kc.numpy_rng("data", self.split, self.epoch, idx)
        n = len(frames)
        if self.knn_tc == 0:
            return [frames[int(rng.integers(0, n))]]
        k = self.knn_tc
        clip_len = 2 * k + 1
        if n >= clip_len:
            a = int(rng.integers(k, n - k))
            return frames[a - k:a + k + 1]
        window = list(frames)
        while len(window) < clip_len:
            window.append(frames[-1])
        return window

    def _fused_cam(self, frame_id: str) -> Optional[np.ndarray]:
        if self.cam_store is None:
            return None
        ids = self._temporal_frames(frame_id)
        t = self.decay_temp.t if self.decay_temp is not None else 0.0
        heated = self.sl_tc_knn > 0 and t > 0
        fused = None
        for fid in ids:
            c = self.cam_store.load_cam(fid)
            if heated:
                c = heat_cam_np(c, t)
            fused = c if fused is None else np.maximum(fused, c)
        return fused

    def get_one(self, idx: int, frame_id: str, frame_iter: int = 0) -> dict:
        shot_or_frame = self.md.image_ids[idx]
        label = self.md.labels[shot_or_frame]

        img = Image.open(os.path.join(self.data_root, frame_id))
        img = img.convert("RGB")

        cam = self._fused_cam(frame_id)
        rng = self.kc.numpy_rng("aug", self.split, self.epoch, idx,
                                frame_iter)
        norm, raw, cam_t = self.transform(img, cam, rng)

        c = self.crop_size
        roi = np.zeros((c, c), np.int64)
        msk_bbox = np.ones((c, c), np.float32)
        if cam_t is not None and self.use_roi:
            # stored threshold is invalid after temporal overheating:
            # re-threshold with Otsu (reference wsol_loader.py:571-580)
            th = None
            if self.sl_tc_knn == 0 and self.cam_store is not None:
                stored = self.cam_store.thresholds
                if stored is not None and frame_id in stored:
                    # the store file keeps [0, 1] (reference
                    # inference_wsol.py:1125); GetRoiSingleCam scales by
                    # 255 (tcam_seeding.py:341-343)
                    th = stored[frame_id] * 255.0
            roi_np, msk_bbox, _ = roi_one_cam_np(
                np.clip(cam_t, 0.0, 1.0), self.roi_method,
                self.p_min_area_roi, thresh=th)
            roi = roi_np.astype(np.int64)

        if cam_t is None:
            cam_t = np.zeros((c, c), np.float32)
            has_cam = np.float32(0.0)
        else:
            cam_t = np.clip(cam_t, 0.0, 1.0)
            has_cam = np.float32(1.0)

        # temporal fg-size estimate for FgSizeTcams (the reference derives
        # it from cam mass over the roi, train_wsol.py:685-696): fraction
        # of the frame covered by the (roi-masked) fused CAM
        if self.use_roi and roi.sum() > 0:
            fg_size = np.float32((cam_t * (roi > 0)).sum() / (c * c))
        else:
            fg_size = np.float32(cam_t.mean())

        return {
            "image": norm,
            "label": np.int32(label),
            "image_id": frame_id,
            "raw_img": raw,
            "std_cam": cam_t.astype(np.float32),
            "has_cam": has_cam,
            "seq_iter": np.float32(idx),
            "frm_iter": np.float32(frame_iter),
            "roi": roi.astype(np.int32),
            "msk_bbox": np.asarray(msk_bbox, np.float32),
            "fg_size": fg_size,
        }

    def cam_roi_for(self, frame_id: str, i: int, j: int, flip: bool):
        """CAM-side transform + ROI for one frame given the image's
        geometric params — used by the native batch loader so the stored
        CAM undergoes exactly the image's crop/flip.

        Returns (std_cam (c,c), has_cam, roi (c,c), msk_bbox (c,c),
        fg_size)."""
        from tcam_wsol_video_tpu.data.transforms import _resize_cam
        c = self.crop_size
        cam = self._fused_cam(frame_id)
        roi = np.zeros((c, c), np.int64)
        msk_bbox = np.ones((c, c), np.float32)
        if cam is None:
            return (np.zeros((c, c), np.float32), np.float32(0.0),
                    roi.astype(np.int32), msk_bbox, np.float32(0.0))
        if self.transform.train:
            r = self.transform.resize_size
            cam_t = _resize_cam(cam, (r, r))[i:i + c, j:j + c]
            if flip:
                cam_t = cam_t[:, ::-1]
        else:
            cam_t = _resize_cam(cam, (c, c))
        cam_t = np.clip(np.ascontiguousarray(cam_t), 0.0, 1.0)
        if self.use_roi:
            th = None
            if self.sl_tc_knn == 0 and self.cam_store is not None:
                stored = self.cam_store.thresholds
                if stored is not None and frame_id in stored:
                    # store file keeps [0, 1]; the ROI module takes [0, 255]
                    th = stored[frame_id] * 255.0
            roi_np, msk_bbox, _ = roi_one_cam_np(
                cam_t, self.roi_method, self.p_min_area_roi, thresh=th)
            roi = roi_np
        if self.use_roi and roi.sum() > 0:
            fg_size = np.float32((cam_t * (roi > 0)).sum() / (c * c))
        else:
            fg_size = np.float32(cam_t.mean())
        return (cam_t.astype(np.float32), np.float32(1.0),
                roi.astype(np.int32), np.asarray(msk_bbox, np.float32),
                fg_size)

    def get_item(self, idx: int) -> List[dict]:
        """All frames for this index (1 or clip_len dicts, clip-ordered)."""
        ids = self.sample_ids(idx)
        return [self.get_one(idx, fid, i) for i, fid in enumerate(ids)]

    def eval_gt_boxes(self, image_id: str) -> np.ndarray:
        return resized_gt_boxes(self.md, image_id, self.crop_size)
