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
                path: str, tags: Optional[Dict] = None,
                alpha: float = 0.6) -> None:
    """One prediction figure: overlay + boxes + tag line."""
    img = np.clip(raw_img, 0, 255).astype(np.uint8)
    vis = cam_overlay(img, cam, alpha=alpha) if cam is not None else img
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


def plot_multiple(raw_img: np.ndarray, cam: np.ndarray,
                  gt_boxes: Sequence, entries: List[Dict],
                  path: str, alpha: float = 0.6) -> None:
    """Multi-panel figure (reference Viz_WSOL.plot_multiple,
    vision_wsol.py:342-365): one column per entry, row 0 = heatmap
    overlay with GT/pred boxes, row 1 = the binarized mask at that
    entry's tau with the same boxes.

    entries: [{"pred_boxes": (P,4), "tau": float, "sigma": int,
               "iou": float}, ...]
    """
    img = np.clip(raw_img, 0, 255).astype(np.uint8)
    n = max(1, len(entries))
    fig, axes = plt.subplots(2, n, figsize=(3 * n, 6), squeeze=False)
    for i, e in enumerate(entries):
        vis = cam_overlay(img, cam, alpha=alpha)
        vis = draw_boxes(vis, gt_boxes, GT_COLOR)
        vis = draw_boxes(vis, e.get("pred_boxes", []), PRED_COLOR)
        axes[0, i].imshow(vis)
        axes[0, i].axis("off")
        tag = f"sigma={e.get('sigma', '')} tau={e.get('tau', 0):.3f}"
        if "iou" in e:
            tag += f" iou={e['iou']:.2f}"
        axes[0, i].set_title(tag, fontsize=8)
        mask = (cam >= e.get("tau", 0.5)).astype(np.float32)
        mvis = (0.5 * img + 0.5 * (mask[..., None] *
                                   np.asarray(PRED_COLOR))).astype(np.uint8)
        mvis = draw_boxes(mvis, gt_boxes, GT_COLOR)
        mvis = draw_boxes(mvis, e.get("pred_boxes", []), PRED_COLOR)
        axes[1, i].imshow(mvis)
        axes[1, i].axis("off")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fig.savefig(path, bbox_inches="tight", dpi=100)
    plt.close(fig)


def ordered_prediction_sheets(visuals: List[tuple],
                              best_tau_list: Sequence[float],
                              iou_threshold_list: Sequence[int],
                              multi_contour: bool,
                              out_dir: str,
                              alpha: float = 0.6
                              ) -> Dict[int, List[tuple]]:
    """Per-IoU ordered best->worst prediction dumps + per-image
    multi-panel sheets (reference _draw_some_best_pred,
    inference_wsol.py:700-1071: per-sigma folders of overlays renamed by
    descending-IoU rank, ordered_iou_{sigma}.yaml/.txt, and the
    plot_multiple sheet across taus).

    visuals: [(image_id, raw_img, cam, gt_boxes), ...].
    Returns {sigma: [(image_id, iou) desc-ordered]}.
    """
    import yaml

    from tcam_wsol_video_tpu.metrics.wsol import scoremap_to_boxes
    from tcam_wsol_video_tpu.ops.boxes import iou_matrix_np

    per_image = []  # (iid, raw, cam, gt, {sigma: (best_box, iou)})
    for iid, raw, cam, gt in visuals:
        boxes_per_tau, _ = scoremap_to_boxes(
            cam, list(best_tau_list), multi_contour)
        by_sigma = {}
        for k, sigma in enumerate(iou_threshold_list):
            boxes = np.asarray(boxes_per_tau[k], np.float64)
            iou = iou_matrix_np(boxes, np.asarray(gt, np.float64))
            flat = iou.max(axis=1) if iou.size else np.zeros(1)
            j = int(np.argmax(flat))
            by_sigma[sigma] = (boxes[j], float(flat[j]))
        per_image.append((iid, raw, cam, gt, by_sigma))

    ordered: Dict[int, List[tuple]] = {}
    for k, sigma in enumerate(iou_threshold_list):
        ranked = sorted(
            ((iid, by[sigma][1]) for iid, _, _, _, by in per_image),
            key=lambda t: t[1], reverse=True)
        ordered[sigma] = ranked
        sig_dir = os.path.join(out_dir, str(sigma))
        os.makedirs(sig_dir, exist_ok=True)
        with open(os.path.join(out_dir, f"ordered_iou_{sigma}.yaml"),
                  "w") as f:
            yaml.safe_dump({iid: iou for iid, iou in ranked}, f)
        with open(os.path.join(out_dir, f"ordered_iou_{sigma}.txt"),
                  "w") as f:
            for iid, iou in ranked:
                f.write(f"{iid.replace('/', '_')}: {iou}\n")
        rank_of = {iid: r for r, (iid, _) in enumerate(ranked)}
        for iid, raw, cam, gt, by in per_image:
            box, iou = by[sigma]
            plot_single(raw, cam, gt, [box],
                        os.path.join(
                            sig_dir,
                            f"{rank_of[iid]:03d}_"
                            f"{iid.replace('/', '_')}.png"),
                        tags={"iou": round(iou, 3),
                              "tau": round(best_tau_list[k], 3),
                              "sigma": sigma},
                        alpha=alpha)

    # per-image multi-panel sheet across the per-IoU best taus
    # (the reference's 'some_taux' family)
    sheet_dir = os.path.join(out_dir, "some_taux")
    for iid, raw, cam, gt, by in per_image:
        entries = [{"pred_boxes": [by[s][0]], "tau": best_tau_list[k],
                    "sigma": s, "iou": by[s][1]}
                   for k, s in enumerate(iou_threshold_list)]
        plot_multiple(raw, cam, gt, entries,
                      os.path.join(sheet_dir,
                                   iid.replace("/", "_") + ".png"),
                      alpha=alpha)
    return ordered


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
