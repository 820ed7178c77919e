"""Synthetic video WSOL dataset: a few classes x videos x shots x frames
with a moving bright square whose bbox is known.

This is the test/bench fixture (SURVEY.md §4d): it writes real .jpg frames
and wsol-done-right metadata so the full data -> model -> cam -> metric
path runs end-to-end without YouTube-Objects on disk.  Layout matches the
reference's YTOv1 folds: train ids are shot directories, eval ids are
frames (/root/repo/SURVEY.md §2.3).
"""
from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np
from PIL import Image


def _draw_frame(h: int, w: int, box: Tuple[int, int, int, int],
                color: Tuple[int, int, int], rng) -> np.ndarray:
    img = (rng.random((h, w, 3)) * 60).astype(np.uint8)
    x0, y0, x1, y1 = box
    img[y0:y1 + 1, x0:x1 + 1] = np.asarray(color, np.uint8)
    return img


def make_synthetic_dataset(root: str, n_classes: int = 3,
                           n_videos_per_class: int = 2,
                           n_shots_per_video: int = 2,
                           n_frames_per_shot: int = 4,
                           frame_hw: Tuple[int, int] = (90, 120),
                           seed: int = 0) -> Dict[str, str]:
    """Returns {'data_root': ..., 'metadata_root': ...}."""
    rng = np.random.default_rng(seed)
    h, w = frame_hw
    data_root = os.path.join(root, "data")
    meta_root = os.path.join(root, "folds")
    classes = [f"class{i}" for i in range(n_classes)]
    colors = [(220, 40, 40), (40, 220, 40), (40, 40, 220),
              (220, 220, 40), (220, 40, 220)]
    if n_classes > len(colors):
        # procedural hues so every class stays visually separable at
        # YTOv1 scale (10 classes) — dress-rehearsal sized sets
        import colorsys
        for i in range(len(colors), n_classes):
            r, g, b = colorsys.hsv_to_rgb((i + 0.5) / n_classes, 0.85, 0.8)
            colors.append((int(r * 255), int(g * 255), int(b * 255)))

    train_ids: List[str] = []
    train_labels: List[str] = []
    eval_rows: Dict[str, List[str]] = {k: [] for k in
                                       ("ids", "labels", "sizes", "locs")}

    for ci, cname in enumerate(classes):
        color = colors[ci % len(colors)]
        for vi in range(n_videos_per_class):
            for si in range(n_shots_per_video):
                shot = f"{cname}/data/{vi:04d}/shots/{si:03d}"
                shot_dir = os.path.join(data_root, shot)
                os.makedirs(shot_dir, exist_ok=True)
                bw, bh = int(w * 0.3), int(h * 0.3)
                x0 = int(rng.integers(0, w - bw - n_frames_per_shot * 2))
                y0 = int(rng.integers(0, h - bh - 2))
                for fi in range(n_frames_per_shot):
                    bx0 = x0 + 2 * fi          # square drifts right
                    box = (bx0, y0, bx0 + bw, y0 + bh)
                    img = _draw_frame(h, w, box, color, rng)
                    fname = f"frame{fi:04d}.jpg"
                    Image.fromarray(img).save(
                        os.path.join(shot_dir, fname), quality=95)
                    fid = f"{shot}/{fname}"
                    # last shot of last video -> eval split member
                    eval_rows["ids"].append(fid)
                    eval_rows["labels"].append(f"{fid},{ci}")
                    eval_rows["sizes"].append(f"{fid},{w},{h}")
                    eval_rows["locs"].append(
                        f"{fid},{box[0]},{box[1]},{box[2]},{box[3]}")
                train_ids.append(shot)
                train_labels.append(f"{shot},{ci}")

    def write(split: str, ids: List[str], labels: List[str],
              sizes: List[str], locs: List[str]):
        d = os.path.join(meta_root, split)
        os.makedirs(d, exist_ok=True)
        for name, rows in (("image_ids.txt", ids),
                           ("class_labels.txt", labels),
                           ("image_sizes.txt", sizes),
                           ("localization.txt", locs)):
            with open(os.path.join(d, name), "w") as f:
                f.write("\n".join(rows) + ("\n" if rows else ""))

    write("train", train_ids, train_labels, [], [])
    # eval splits index frames; use every 2nd frame for val, rest for test
    val_sel = list(range(0, len(eval_rows["ids"]), 2))
    tst_sel = list(range(1, len(eval_rows["ids"]), 2))
    # test-video-demo mirrors the reference's demo split (one video per
    # class from the test pool; folds zip layout, wsol_loader.py:64-181)
    # — the default split of cli/demo_video
    demo_sel = [i for i in tst_sel
                if eval_rows["ids"][i].split("/")[2] == "0000"]
    for split, sel in (("val", val_sel), ("test", tst_sel),
                       ("test-video-demo", demo_sel)):
        write(split,
              [eval_rows["ids"][i] for i in sel],
              [eval_rows["labels"][i] for i in sel],
              [eval_rows["sizes"][i] for i in sel],
              [eval_rows["locs"][i] for i in sel])

    with open(os.path.join(meta_root, "class_id.yaml"), "w") as f:
        f.write("{" + ", ".join(f"{c}: {i}" for i, c in enumerate(classes))
                + "}\n")
    # alias so `<parent>/<dataset-name>` resolves like a real install
    alias = os.path.join(root, "YouTube-Objects-v1.0")
    if not os.path.exists(alias):
        os.symlink(data_root, alias)
    return {"data_root": data_root, "metadata_root": meta_root,
            "parent": root}
