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


def test_plot_multiple_panels(tmp_path, rng):
    img = (rng.random((32, 32, 3)) * 255).astype(np.float32)
    cam = rng.random((32, 32)).astype(np.float32)
    p = str(tmp_path / "multi.png")
    wsol_viz.plot_multiple(
        img, cam, [[2, 2, 10, 10]],
        [{"pred_boxes": [[3, 3, 12, 12]], "tau": 0.3, "sigma": 30,
          "iou": 0.4},
         {"pred_boxes": [[4, 4, 14, 14]], "tau": 0.5, "sigma": 50,
          "iou": 0.2}], p)
    assert os.path.getsize(p) > 0


def test_ordered_prediction_sheets(tmp_path, rng):
    """Per-IoU folders with rank-prefixed files ordered by descending
    IoU, ordered_iou yaml/txt, and per-image multi-panel sheets
    (reference inference_wsol.py:700-1071 artifact family)."""
    import yaml

    visuals = []
    for i in range(3):
        img = (rng.random((32, 32, 3)) * 255).astype(np.float32)
        cam = np.zeros((32, 32), np.float32)
        # blob of increasing overlap with the fixed GT box
        cam[4:12 + 6 * i, 4:12 + 6 * i] = 1.0
        visuals.append((f"v/im{i}", img, cam,
                        np.asarray([[4, 4, 24, 24]], np.float64)))
    out = str(tmp_path / "vizu")
    ordered = wsol_viz.ordered_prediction_sheets(
        visuals, [0.1, 0.2, 0.3], [30, 50, 70], True, out)
    for sigma in (30, 50, 70):
        ranked = ordered[sigma]
        assert [r[1] for r in ranked] == sorted(
            [r[1] for r in ranked], reverse=True)
        y = yaml.safe_load(open(os.path.join(out,
                                             f"ordered_iou_{sigma}.yaml")))
        assert len(y) == 3
        files = sorted(os.listdir(os.path.join(out, str(sigma))))
        assert len(files) == 3
        # rank 0 file is the best-IoU image
        assert files[0].startswith("000_")
        assert ranked[0][0].replace("/", "_") in files[0]
    sheets = os.listdir(os.path.join(out, "some_taux"))
    assert len(sheets) == 3
