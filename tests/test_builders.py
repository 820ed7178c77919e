"""Offline dataset builders: raw release -> wsol-done-right folds.

Covers the YouTube-Objects builder (fabricated raw release with
*_sticks.mat 'coor' annotations, reference _video_ds_ytov1_0.py) and
the YT-BB detection-CSV builder (capability the reference left
incomplete — _video_ds_yt_bb.py ships only a stats checker).
"""
import os

import numpy as np
import pytest
from PIL import Image

from tcam_wsol_video_tpu.data import builders
from tcam_wsol_video_tpu.data.folds import load_split_metadata


def _jpg(path, w=32, h=24):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (h, w, 3), np.uint8)
    ).save(path)


# ------------------------------------------------------------------ YTO
def _make_raw_release(root, n_classes=2, n_videos=3, n_frames=3):
    """<class>/data/<video>/shots/<shot>/frame_N.jpg (+ sticks on video 1
    frames) — the raw YTO layout indexed by index_raw_release."""
    from scipy import io as sio
    for c in range(n_classes):
        cname = f"class{c}"
        for v in range(n_videos):
            shot = os.path.join(root, cname, "data", f"vid{v}", "shots",
                                "001")
            for f in range(n_frames):
                fp = os.path.join(shot, f"frame_{f}.jpg")
                _jpg(fp)
                if v == 0:  # annotate every frame of video 0
                    # 'coor' is a MATLAB cell array of (1, 4) boxes
                    cell = np.empty((1, 1), dtype=object)
                    cell[0, 0] = np.array([[2.0, 3.0, 20.0, 15.0]])
                    sio.savemat(fp + "_sticks.mat", {"coor": cell})


def test_build_metadata_yto_splits(tmp_path):
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "folds")
    _make_raw_release(raw)
    class_id = builders.build_metadata(raw, out, version="v2.2", seed=0)
    assert class_id == {"class0": 0, "class1": 1}

    # test split: annotated frames with sizes + boxes
    test = load_split_metadata(out, "test")
    assert len(test.image_ids) > 0
    for fid in test.image_ids:
        assert fid.endswith(".jpg") and "/shots/" in fid
        assert test.sizes[fid] == (32, 24)
        (box,) = test.boxes[fid]
        assert box == pytest.approx([2.0, 3.0, 20.0, 15.0])

    # train split: weak labels only (empty localization)
    train = load_split_metadata(out, "train")
    assert len(train.image_ids) > 0
    assert not train.boxes
    # train ids are shot ids of non-val videos
    val = load_split_metadata(out, "val")
    val_videos = {i.split("/")[2] for i in val.image_ids}
    train_videos = {i.split("/")[2] for i in train.image_ids}
    assert not (val_videos & train_videos)

    # demo split covers all frames of the test videos
    demo = load_split_metadata(out, "test-video-demo")
    test_videos = {i.split("/")[2] for i in test.image_ids}
    assert {i.split("/")[2] for i in demo.image_ids} == test_videos
    assert len(demo.image_ids) >= len(test.image_ids)


def test_repair_box():
    # flipped extents are swapped, overshoot clamped
    assert builders.repair_box([20, 15, 2, 3], "x", (32, 24)) == \
        [2, 3, 20, 15]
    assert builders.repair_box([0, 0, 100, 100], "x", (32, 24)) == \
        [0, 0, 31, 23]
    # degenerate box rejected
    assert builders.repair_box([5, 5, 5, 5], "x", (32, 24)) is None


# ---------------------------------------------------------------- YT-BB
def _ytbb_csv(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")


def test_build_ytbb_metadata(tmp_path):
    frames = str(tmp_path / "frames")
    out = str(tmp_path / "folds")
    # video A (cat, annotated, 3 frames), video B (cat), video C (dog),
    # video M carries two classes -> must be dropped
    train_rows = []
    for yid, cls, n in (("vidA", "cat", 3), ("vidB", "cat", 2),
                        ("vidC", "dog", 2), ("vidD", "dog", 2)):
        for t in range(n):
            ts = 1000 * t
            train_rows.append(
                (yid, ts, 0, cls, 0, "present", 0.25, 0.75, 0.25, 0.75))
            _jpg(os.path.join(frames, cls, f"{yid}_0", "0", f"{ts}.jpg"),
                 w=40, h=20)
    train_rows.append(("vidM", 0, 0, "cat", 0, "present", 0, 1, 0, 1))
    train_rows.append(("vidM", 0, 1, "dog", 1, "present", 0, 1, 0, 1))
    _jpg(os.path.join(frames, "cat", "vidM_0", "0", "0.jpg"))
    # absent row: ignored
    train_rows.append(("vidB", 9000, 0, "cat", 0, "absent", -1, -1, -1, -1))
    _ytbb_csv(tmp_path / "det_train.csv", train_rows)

    val_rows = [("vidT", 0, 0, "cat", 0, "present", 0.0, 0.5, 0.0, 0.5)]
    _jpg(os.path.join(frames, "cat", "vidT_0", "0", "0.jpg"), w=40, h=20)
    _ytbb_csv(tmp_path / "det_val.csv", val_rows)

    class_id = builders.build_ytbb_metadata(
        str(tmp_path / "det_train.csv"), str(tmp_path / "det_val.csv"),
        frames, out, k_val=1, seed=0)
    assert class_id == {"cat": 0, "dog": 1}

    train = load_split_metadata(out, "train")
    val = load_split_metadata(out, "val")
    test = load_split_metadata(out, "test")

    # the multi-class video was dropped everywhere
    all_ids = train.image_ids + val.image_ids + test.image_ids
    assert not any("vidM" in i for i in all_ids)

    # test = official validation csv, denormalized boxes vs the 40x20 jpg
    assert test.image_ids == ["cat/vidT_0/0/0.jpg"]
    (box,) = test.boxes["cat/vidT_0/0/0.jpg"]
    assert box == pytest.approx([0.0, 0.0, 0.5 * 40 + 1, 0.5 * 20 + 1])
    assert test.sizes["cat/vidT_0/0/0.jpg"] == (40, 20)

    # k_val=1 video per class held out; no overlap with train
    val_videos = {i.split("/")[1] for i in val.image_ids}
    train_videos = {i.split("/")[1] for i in train.image_ids}
    assert not (val_videos & train_videos)
    assert len(val_videos) == 2  # one per class
    # val frames carry boxes; train has weak labels only
    assert all(val.boxes[i] for i in val.image_ids)
    assert not train.boxes


def test_proxy_split_and_subsample(tmp_path):
    """proxy_training_set reads image_ids_proxy.txt; mini-val keeps
    n random ids per class (reference wsol_loader.py:64-90, :424-445)."""
    import numpy as np
    from tcam_wsol_video_tpu.data.folds import (load_split_metadata,
                                                subsample_per_class)

    root = tmp_path / "folds" / "train"
    root.mkdir(parents=True)
    ids = [f"im{i}" for i in range(6)]
    (root / "image_ids.txt").write_text("\n".join(ids) + "\n")
    (root / "image_ids_proxy.txt").write_text("im0\nim3\n")
    (root / "class_labels.txt").write_text(
        "\n".join(f"{i},{k % 2}" for k, i in enumerate(ids)) + "\n")

    md = load_split_metadata(str(tmp_path / "folds"), "train")
    assert len(md) == 6
    mdp = load_split_metadata(str(tmp_path / "folds"), "train", proxy=True)
    assert mdp.image_ids == ["im0", "im3"]
    assert mdp.labels["im3"] == 1

    sub = subsample_per_class(md, 1, np.random.default_rng(0))
    assert len(sub) == 2
    assert sorted({sub.labels[i] for i in sub.image_ids}) == [0, 1]
    # n=0 is identity
    assert subsample_per_class(md, 0, np.random.default_rng(0)) is md


def test_ytbb_csv_header_skipped_but_corrupt_rows_raise(tmp_path):
    """Only a recognizable header line is skipped silently; corrupted
    DATA rows must raise with their file:line, not vanish (advisor r3:
    a blanket non-integer-timestamp skip dropped bad rows without the
    promised error)."""
    import pytest

    good = ("vidA", 1000, 0, "cat", 0, "present", 0.25, 0.75, 0.25, 0.75)
    header = ("youtube_id", "timestamp_ms", "class_id", "class_name",
              "object_id", "object_presence", "xmin", "xmax", "ymin",
              "ymax")
    p = tmp_path / "ok.csv"
    _ytbb_csv(p, [header, good])
    rows = builders.parse_ytbb_detection_csv(str(p))
    assert len(rows) == 1 and rows[0].youtube_id == "vidA"

    bad_ts = ("vidA", "12e3", 0, "cat", 0, "present", 0.1, 0.9, 0.1, 0.9)
    p2 = tmp_path / "bad_ts.csv"
    _ytbb_csv(p2, [header, good, bad_ts])
    with pytest.raises(ValueError, match="bad_ts.csv:3"):
        builders.parse_ytbb_detection_csv(str(p2))

    p3 = tmp_path / "short.csv"
    _ytbb_csv(p3, [good, ("vidA", 1000, 0, "cat")])
    with pytest.raises(ValueError, match="short.csv:2"):
        builders.parse_ytbb_detection_csv(str(p3))
