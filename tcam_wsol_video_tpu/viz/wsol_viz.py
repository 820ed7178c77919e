"""Visualization: CAM heatmap overlays, GT/pred boxes, training-progress
plots, curve plots, demo videos.

Parity target: /root/reference/dlib/visualization/vision_wsol.py:75-763
(Viz_WSOL.plot_single/plot_multiple: image + GT(green)/pred(red) boxes +
CAM overlay + IoU/tau tags), vision_progress.py (per-epoch CAM progress of
fixed frames), videos.py:33-118 + inference_wsol.py:1041-1065 (demo mp4 via
cv2.VideoWriter), train_wsol.py:1856-1932 (meter curves).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

GT_COLOR = (0, 255, 0)     # green
PRED_COLOR = (255, 0, 0)   # red


def cam_overlay(raw_img: np.ndarray, cam: np.ndarray,
                alpha: float = 0.6) -> np.ndarray:
    """raw_img (H, W, 3) uint8/float [0,255]; cam (H, W) in [0,1] ->
    heatmap blend uint8."""
    img = np.clip(raw_img, 0, 255).astype(np.uint8)
    heat = cv2.applyColorMap((np.clip(cam, 0, 1) * 255).astype(np.uint8),
                             cv2.COLORMAP_JET)
    heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB)
    return (alpha * img + (1 - alpha) * heat).astype(np.uint8)


def draw_boxes(img: np.ndarray, boxes: Sequence[Sequence[float]],
               color=GT_COLOR, thickness: int = 2) -> np.ndarray:
    out = img.copy()
    for b in boxes:
        x0, y0, x1, y1 = [int(round(v)) for v in b]
        cv2.rectangle(out, (x0, y0), (x1, y1), color, thickness)
    return out


def plot_single(raw_img: np.ndarray, cam: Optional[np.ndarray],
                gt_boxes: Sequence, pred_boxes: Sequence,
                path: str, tags: Optional[Dict] = None) -> None:
    """One prediction figure: overlay + boxes + tag line."""
    img = np.clip(raw_img, 0, 255).astype(np.uint8)
    vis = cam_overlay(img, cam) if cam is not None else img
    vis = draw_boxes(vis, gt_boxes, GT_COLOR)
    vis = draw_boxes(vis, pred_boxes, PRED_COLOR)
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.imshow(vis)
    ax.axis("off")
    if tags:
        ax.set_title(" ".join(f"{k}={v}" for k, v in tags.items()),
                     fontsize=8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=120)
    plt.close(fig)


def plot_progress_grid(raw_imgs: List[np.ndarray], cams: List[np.ndarray],
                       path: str, epoch: int) -> None:
    """Fixed-frame CAM progress grid, one row per frame (reference
    vision_progress.py:151)."""
    n = len(raw_imgs)
    fig, axes = plt.subplots(1, max(n, 1), figsize=(3 * n, 3))
    if n == 1:
        axes = [axes]
    for ax, img, cam in zip(axes, raw_imgs, cams):
        ax.imshow(cam_overlay(img, cam))
        ax.axis("off")
    fig.suptitle(f"epoch {epoch}")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=100)
    plt.close(fig)


def plot_meter_curves(histories: Dict[str, List[float]], path: str) -> None:
    """Per-metric epoch curves (reference plot_perfs_meter,
    train_wsol.py:1856-1932)."""
    n = len(histories)
    fig, axes = plt.subplots(1, max(n, 1), figsize=(4 * n, 3))
    if n == 1:
        axes = [axes]
    for ax, (name, hist) in zip(axes, histories.items()):
        ax.plot(hist)
        ax.set_title(name, fontsize=9)
        ax.set_xlabel("epoch")
        ax.grid(True, alpha=0.3)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=100)
    plt.close(fig)


def plot_boxacc_curves(taus: Sequence[float],
                       curves: Dict, path: str) -> None:
    """BoxAcc-vs-tau curves per IoU threshold (reference
    train_wsol.py:1541-1576)."""
    fig, ax = plt.subplots(figsize=(5, 4))
    for sigma, acc in curves.items():
        if not isinstance(sigma, int):
            continue
        ax.plot(taus, acc, label=f"IoU {sigma}")
    ax.set_xlabel("cam threshold tau")
    ax.set_ylabel("BoxAcc (%)")
    ax.legend()
    ax.grid(True, alpha=0.3)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=120)
    plt.close(fig)


def build_demo_video(frames: List[np.ndarray], path: str,
                     fps: int = 8) -> None:
    """Write an mp4 from RGB frames (reference videos.py:33-118)."""
    assert frames
    h, w = frames[0].shape[:2]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    try:
        for f in frames:
            writer.write(cv2.cvtColor(np.clip(f, 0, 255).astype(np.uint8),
                                      cv2.COLOR_RGB2BGR))
    finally:
        writer.release()
