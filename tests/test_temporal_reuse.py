"""Change-based inference (EVA^2/CBinfer-style, PAPERS.md) for the
demo/serving path: planner unit tests + demo-CLI integration."""
import os

import numpy as np
import pytest

from tcam_wsol_video_tpu.engine.temporal_reuse import FrameReusePlanner


def _raw(v):
    return np.full((8, 8, 3), v, np.float32)


def test_planner_reuses_static_frames_and_chains_per_video():
    p = FrameReusePlanner(threshold=2.0)
    vids = ["a", "a", "a", "b", "b"]
    raws = np.stack([_raw(10), _raw(10.5), _raw(40), _raw(7), _raw(7.2)])
    compute, reuse = p.plan(vids, raws)
    # a: frame0 computed, frame1 static (reused), frame2 changed
    # b: frame0 computed, frame1 static
    assert compute == [0, 2, 3]
    assert reuse == [None, "a", None, None, "b"]
    assert p.n_computed == 3 and p.n_reused == 2
    assert p.reuse_fraction == pytest.approx(0.4)
    # next batch: a's reference is now frame2 (value 40)
    compute2, reuse2 = p.plan(["a"], np.stack([_raw(40.5)]))
    assert compute2 == [] and reuse2 == ["a"]


def test_resolve_rows_reuse_precedes_computed_same_video():
    """A reuse row that comes BEFORE a computed (changed) frame of the
    same video in one batch must get the prior batch's CAM, not the
    future computed frame's (advisor round-2 finding)."""
    p = FrameReusePlanner(threshold=2.0)
    # batch 1: video a frame computed -> CAM 1
    compute, reuse = p.plan(["a"], np.stack([_raw(10)]))
    out = np.zeros((1, 4, 4), np.float32)
    p.resolve_rows(["a"], compute, reuse,
                   np.ones((1, 4, 4), np.float32), out)
    # batch 2: [a_static, a_changed] -> row0 reuses, row1 computed CAM 2
    vids = ["a", "a"]
    compute2, reuse2 = p.plan(vids, np.stack([_raw(10.2), _raw(90)]))
    assert compute2 == [1] and reuse2 == ["a", None]
    out2 = np.zeros((2, 4, 4), np.float32)
    p.resolve_rows(vids, compute2, reuse2,
                   np.full((1, 4, 4), 2.0, np.float32), out2)
    assert np.all(out2[0] == 1.0)   # prior CAM, not the future row's
    assert np.all(out2[1] == 2.0)
    # and the cached CAM for `a` is now the newly computed one
    assert np.all(p.cam_for("a") == 2.0)


def test_planner_threshold_zero_disables_reuse():
    p = FrameReusePlanner(threshold=0.0)
    raws = np.stack([_raw(5), _raw(5)])
    compute, reuse = p.plan(["a", "a"], raws)
    assert compute == [0, 1] and reuse == [None, None]
    assert p.reuse_fraction == 0.0


def test_demo_cli_change_based_inference(tmp_path_factory):
    """Demo CLI with --reuse_threshold on a synthetic set: videos are
    written with the full frame count while a nonzero fraction of model
    calls is skipped (synthetic shots are near-static)."""
    from tcam_wsol_video_tpu.cli import demo_video, train
    from tcam_wsol_video_tpu.data.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("reuse")
    out = make_synthetic_dataset(str(root))
    exps = str(tmp_path_factory.mktemp("exps_reuse"))
    train.main([
        "--dataset", "YouTube-Objects-v1.0", "--task", "STD_CL",
        "--data_root", str(root), "--metadata_root", out["metadata_root"],
        "--crop_size", "32", "--resize_size", "40", "--batch_size", "4",
        "--eval_batch_size", "8", "--max_epochs", "1",
        "--cam_curve_interval", "0.05", "--checkpoint_save", "0",
        "--num_workers", "1", "--outd", exps, "--exp_id", "r"])
    exp_dir = os.path.join(
        exps, "YouTube-Objects-v1.0-resnet50-CAM-WGAP-"
        "cp_best_localization-boxv2_True", "r")

    # no --split: exercises the CLI's default test-video-demo split,
    # which the synthetic builder now emits (reference folds layout)
    common = ["--exp_dir", exp_dir,
              "--dataset", "YouTube-Objects-v1.0", "--task", "STD_CL",
              "--data_root", str(root),
              "--metadata_root", out["metadata_root"],
              "--crop_size", "32", "--resize_size", "40",
              "--num_workers", "1", "--max_videos", "2"]
    base = demo_video.main(common + ["--out", str(root / "d0")])
    reuse = demo_video.main(common + ["--out", str(root / "d1"),
                                      "--reuse_threshold", "255"])
    assert len(base) == len(reuse) > 0
    for b, r in zip(sorted(base), sorted(reuse)):
        assert os.path.getsize(b) > 0 and os.path.getsize(r) > 0
