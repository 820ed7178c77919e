"""Metadata folds reader (wsol-done-right text formats).

Parity target: the metadata loaders in
/root/reference/dlib/datasets/wsol_loader.py:64-181 — per split, four
files: image_ids.txt (one relative path per line), class_labels.txt
(`id,label`), image_sizes.txt (`id,w,h`), localization.txt
(`id,x0,y0,x1,y1` one line per box; empty for weakly-labeled train) plus
class_id.yaml at the dataset root.  File formats are kept byte-compatible
so the reference's folds zip works unchanged.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
import yaml


@dataclass
class SplitMetadata:
    split: str
    image_ids: List[str]
    labels: Dict[str, int]
    sizes: Dict[str, Tuple[int, int]] = field(default_factory=dict)
    boxes: Dict[str, List[Tuple[float, float, float, float]]] = \
        field(default_factory=dict)
    mask_paths: Dict[str, List[str]] = field(default_factory=dict)

    def __len__(self):
        return len(self.image_ids)


def _read_lines(path: str) -> List[str]:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def load_split_metadata(metadata_root: str, split: str,
                        image_ids: Optional[List[str]] = None,
                        proxy: bool = False
                        ) -> SplitMetadata:
    """proxy=True reads image_ids_proxy.txt instead — the reduced
    train-split stand-in used for train-set evaluation (reference
    configure_metadata/get_image_ids `proxy` suffix,
    /root/reference/dlib/datasets/wsol_loader.py:64-90)."""
    root = os.path.join(metadata_root, split)
    ids_file = "image_ids_proxy.txt" if proxy else "image_ids.txt"
    ids = image_ids or _read_lines(os.path.join(root, ids_file))

    labels: Dict[str, int] = {}
    for ln in _read_lines(os.path.join(root, "class_labels.txt")):
        iid, lab = ln.rsplit(",", 1)
        labels[iid] = int(lab)

    md = SplitMetadata(split=split, image_ids=ids, labels=labels)

    sizes_path = os.path.join(root, "image_sizes.txt")
    if os.path.isfile(sizes_path):
        for ln in _read_lines(sizes_path):
            parts = ln.split(",")
            iid, w, h = ",".join(parts[:-2]), parts[-2], parts[-1]
            md.sizes[iid] = (int(float(w)), int(float(h)))

    loc_path = os.path.join(root, "localization.txt")
    if os.path.isfile(loc_path):
        for ln in _read_lines(loc_path):
            parts = ln.split(",")
            if len(parts) >= 5 and not parts[-1].endswith((".png", ".jpg")):
                iid = ",".join(parts[:-4])
                box = tuple(float(v) for v in parts[-4:])
                md.boxes.setdefault(iid, []).append(box)  # type: ignore
            elif len(parts) == 2:  # OpenImages: id, mask path
                md.mask_paths.setdefault(parts[0], []).append(parts[1])
    return md


def load_class_ids(metadata_root: str) -> Dict[str, int]:
    path = os.path.join(metadata_root, "class_id.yaml")
    with open(path) as f:
        return yaml.safe_load(f)


def load_gt_mask(md: SplitMetadata, mask_root: str, image_id: str,
                 size: int) -> np.ndarray:
    """Union of the GT masks of one image resized to (size, size) —
    OpenImages PxAP path (reference load_mask_image + get_mask,
    /root/reference/dlib/metrics/wsol_metrics.py:435-482)."""
    from PIL import Image
    out = np.zeros((size, size), np.float32)
    for rel in md.mask_paths.get(image_id, []):
        m = Image.open(os.path.join(mask_root, rel)).convert("L")
        m = m.resize((size, size), Image.NEAREST)
        out = np.maximum(out, (np.asarray(m, np.float32) > 127).astype(
            np.float32))
    return out


def subsample_per_class(md: SplitMetadata, n_per_class: int,
                        rng: np.random.Generator) -> SplitMetadata:
    """Keep n_per_class randomly chosen ids per class (reference
    _adjust_samples_per_class, wsol_loader.py:424-445 — the
    num_val_sample_per_class mini-val knob).  n_per_class=0 is identity."""
    if n_per_class == 0:
        return md
    ids = np.asarray(md.image_ids)
    labels = np.asarray([md.labels[i] for i in md.image_ids])
    keep: List[str] = []
    for lab in np.unique(labels):
        idx = np.where(labels == lab)[0]
        take = min(n_per_class, len(idx))
        keep += ids[rng.choice(idx, take, replace=False)].tolist()
    return SplitMetadata(
        split=md.split, image_ids=keep,
        labels={i: md.labels[i] for i in keep},
        sizes={i: md.sizes[i] for i in keep if i in md.sizes},
        boxes={i: md.boxes[i] for i in keep if i in md.boxes},
        mask_paths={i: md.mask_paths[i] for i in keep
                    if i in md.mask_paths})


def build_size_priors(md: SplitMetadata, crop_size: int,
                      num_classes: int) -> Dict[str, np.ndarray]:
    """Per-class box-size priors from a split's GT boxes resized to
    crop_size (reference WSOLImageLabelDataset.build_size_priors,
    /root/reference/dlib/datasets/wsol_loader.py:645-691): for each class,
    min/max of normalized box height, width and area over every GT box.

    Returns {'min_h','max_h','min_w','max_w','min_s','max_s'} ->
    (num_classes,) float arrays.  Classes with no boxes keep the neutral
    defaults (min=0, max=1) — the C_BOX pre-forward then behaves like
    SIZE_CONST for them.
    """
    mins = {k: np.full((num_classes,), np.inf, np.float32)
            for k in ("min_h", "min_w", "min_s")}
    maxs = {k: np.zeros((num_classes,), np.float32)
            for k in ("max_h", "max_w", "max_s")}
    for iid in md.image_ids:
        lab = md.labels[iid]
        for x0, y0, x1, y1 in resized_gt_boxes(md, iid, crop_size):
            w = (x1 - x0) / float(crop_size)
            h = (y1 - y0) / float(crop_size)
            s = h * w
            for k, v in (("min_h", h), ("min_w", w), ("min_s", s)):
                mins[k][lab] = min(mins[k][lab], v)
            for k, v in (("max_h", h), ("max_w", w), ("max_s", s)):
                maxs[k][lab] = max(maxs[k][lab], v)
    for k in mins:
        mins[k] = np.where(np.isfinite(mins[k]), mins[k], 0.0
                           ).astype(np.float32)
    for k in maxs:
        maxs[k] = np.where(maxs[k] > 0, maxs[k], 1.0).astype(np.float32)
    return {**mins, **maxs}


def resized_gt_boxes(md: SplitMetadata, image_id: str,
                     crop_size: int) -> np.ndarray:
    """GT boxes scaled from the original image size to crop_size
    (reference BoxEvaluator._load_resized_boxes,
    wsol_metrics.py:287-293)."""
    from tcam_wsol_video_tpu.ops.boxes import resize_bbox
    w, h = md.sizes[image_id]
    out = [resize_bbox(b, (w, h), (crop_size, crop_size))
           for b in md.boxes.get(image_id, [])]
    return np.asarray(out, np.float32).reshape(-1, 4)
