"""Visualization unit tests (overlays, boxes, curves, demo video)."""
import os

import numpy as np

from tcam_wsol_video_tpu.viz import wsol_viz


def test_cam_overlay_and_boxes(rng):
    img = (rng.random((32, 32, 3)) * 255).astype(np.float32)
    cam = rng.random((32, 32)).astype(np.float32)
    vis = wsol_viz.cam_overlay(img, cam)
    assert vis.shape == (32, 32, 3) and vis.dtype == np.uint8
    boxed = wsol_viz.draw_boxes(vis, [[4, 4, 20, 20]])
    assert boxed.shape == vis.shape
    # the rectangle painted green pixels along the border
    assert (boxed[4, 4:20] != vis[4, 4:20]).any()


def test_plot_single_and_curves(tmp_path, rng):
    img = (rng.random((32, 32, 3)) * 255).astype(np.float32)
    cam = rng.random((32, 32)).astype(np.float32)
    p1 = str(tmp_path / "single.png")
    wsol_viz.plot_single(img, cam, [[2, 2, 10, 10]], [[3, 3, 12, 12]],
                         p1, tags={"iou": 0.5})
    assert os.path.getsize(p1) > 0
    p2 = str(tmp_path / "curves.png")
    wsol_viz.plot_boxacc_curves(
        list(np.arange(0, 1, 0.1)),
        {"x": list(np.arange(0, 1, 0.1)),
         30: np.random.rand(10) * 100, 50: np.random.rand(10) * 100},
        p2)
    assert os.path.getsize(p2) > 0
    p3 = str(tmp_path / "meters.png")
    wsol_viz.plot_meter_curves({"loss": [3.0, 2.0, 1.0]}, p3)
    assert os.path.getsize(p3) > 0


def test_demo_video_writer(tmp_path, rng):
    frames = [(rng.random((32, 48, 3)) * 255).astype(np.uint8)
              for _ in range(5)]
    path = str(tmp_path / "demo.mp4")
    wsol_viz.build_demo_video(frames, path, fps=4)
    assert os.path.getsize(path) > 0
