"""Paired geometric augmentations for (image, raw_image, std_cam).

Parity target: the joint transform pipeline in
/root/reference/dlib/datasets/wsol_loader.py:700-908 —
train: Resize(resize, resize) -> RandomCrop(crop) -> RandomHorizontalFlip
-> normalize(ImageNet); eval: Resize(crop, crop) -> normalize.  The same
geometric params apply to the normalized image, the raw [0,255] image and
the stored CAM; only the network input gets normalized.

Host-side numpy/PIL pipeline (the TPU never sees augmentation branches);
randomness comes from an explicit np.random.Generator so epochs are
replayable from the KeyChain.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image

from tcam_wsol_video_tpu.core.constants import IMAGENET_MEAN, IMAGENET_STD


def _resize_img(img: Image.Image, size: Tuple[int, int]) -> Image.Image:
    return img.resize((size[1], size[0]), Image.BILINEAR)


def _resize_cam(cam: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """torch-interpolate-style bilinear (align_corners=False) on (H, W)."""
    from tcam_wsol_video_tpu.ops.interpolate import _linear_matrix
    mh = _linear_matrix(cam.shape[0], size[0], False)
    mw = _linear_matrix(cam.shape[1], size[1], False)
    return mh @ cam @ mw.T


def normalize_imagenet(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) float [0,1] -> normalized."""
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    return (img - mean) / std


class PairedTransform:
    """Callable (pil_img, cam or None, rng) ->
    (normalized float32 (H,W,3), raw float32 (H,W,3) in [0,255],
     cam float32 (H,W) or None)."""

    def __init__(self, resize_size: int, crop_size: int, train: bool,
                 hflip_p: float = 0.5):
        self.resize_size = resize_size
        self.crop_size = crop_size
        self.train = train
        self.hflip_p = hflip_p

    def __call__(self, img: Image.Image, cam: Optional[np.ndarray],
                 rng: Optional[np.random.Generator] = None):
        c = self.crop_size
        if self.train:
            assert rng is not None
            r = self.resize_size
            img = _resize_img(img, (r, r))
            if cam is not None:
                cam = _resize_cam(cam, (r, r))
            # random crop
            i = int(rng.integers(0, r - c + 1))
            j = int(rng.integers(0, r - c + 1))
            arr = np.asarray(img, np.float32)[i:i + c, j:j + c]
            if cam is not None:
                cam = cam[i:i + c, j:j + c]
            # random hflip
            if rng.random() < self.hflip_p:
                arr = arr[:, ::-1]
                if cam is not None:
                    cam = cam[:, ::-1]
        else:
            img = _resize_img(img, (c, c))
            arr = np.asarray(img, np.float32)
            if cam is not None:
                cam = _resize_cam(cam, (c, c))

        raw = np.ascontiguousarray(arr)
        norm = normalize_imagenet(raw / 255.0).astype(np.float32)
        if cam is not None:
            cam = np.ascontiguousarray(cam).astype(np.float32)
        return norm, raw, cam
