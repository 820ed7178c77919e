"""The REAL folds metadata: parse the reference's actual splits zip.

Every other data-layer test runs on fabricated metadata.  The reference
ships the actual YTOv1 wsol-done-right splits
(/root/reference/folds/wsol-done-right-splits.zip, wired at
constants.RELATIVE_META_ROOT — reference constants.py:224), and this is
the one piece of the real dataset present in this environment — so the
folds reader, shot-mode detection, shot indexing, class-id mapping and
size-prior builder are proven here against it.  (The zip ships YTOv1
only; YTOv2.2 folds are produced by the offline builder,
data/builders.py.)

Ground-truth facts about the zip (measured once, pinned):
  train           2768 shot-directory ids, localization.txt EMPTY (weak)
  val              325 frame ids,  347 boxes
  test             346 frame ids,  396 boxes
  test-video-demo 134119 frame ids (every frame of the demo shots)
  class_id.yaml   10 classes, aeroplane..train -> 0..9
"""
import os
import zipfile

import numpy as np
import pytest

from tcam_wsol_video_tpu.core import constants as C
from tcam_wsol_video_tpu.core.prng import KeyChain
from tcam_wsol_video_tpu.data.folds import (build_size_priors,
                                            load_class_ids,
                                            load_split_metadata,
                                            resized_gt_boxes)
from tcam_wsol_video_tpu.data.dataset import WSOLVideoDataset
from tcam_wsol_video_tpu.data.transforms import PairedTransform

ZIP = "/root/reference/folds/wsol-done-right-splits.zip"

YTO_CLASSES = ["aeroplane", "bird", "boat", "car", "cat",
               "cow", "dog", "horse", "motorbike", "train"]


@pytest.fixture(scope="module")
def meta_root(tmp_path_factory):
    if not os.path.isfile(ZIP):
        pytest.skip("reference folds zip not available")
    d = tmp_path_factory.mktemp("realfolds")
    with zipfile.ZipFile(ZIP) as z:
        z.extractall(d)
    root = os.path.join(d, "wsol-done-right-splits", C.YTOV1)
    assert os.path.isdir(root)
    return root


def test_class_ids_real(meta_root):
    cid = load_class_ids(meta_root)
    assert len(cid) == 10
    assert sorted(cid) == YTO_CLASSES
    assert sorted(cid.values()) == list(range(10))
    # the mapping is alphabetical, a property the builders reproduce
    for i, name in enumerate(YTO_CLASSES):
        assert cid[name] == i


@pytest.mark.parametrize("split,n_ids,n_boxes", [
    ("train", 2768, 0),
    ("val", 325, 347),
    ("test", 346, 396),
])
def test_real_split_parses(meta_root, split, n_ids, n_boxes):
    md = load_split_metadata(meta_root, split)
    assert len(md.image_ids) == n_ids
    assert len(md.image_ids) == len(set(md.image_ids))
    # every id is labeled, with every class present in every split
    labs = [md.labels[i] for i in md.image_ids]
    assert set(labs) == set(range(10))
    # image_ids lead with the class name: label consistency end to end
    cid = load_class_ids(meta_root)
    for iid in md.image_ids:
        assert md.labels[iid] == cid[iid.split("/")[0]]
    total_boxes = sum(len(b) for b in md.boxes.values())
    assert total_boxes == n_boxes
    if split == "train":
        # weakly-labeled: no localization at train time
        assert not md.boxes
        # ...and no sizes either: train ids are SHOT DIRECTORIES, and
        # image_sizes.txt is empty (sizes are a per-frame concept)
        assert not md.sizes
        assert not md.image_ids[0].endswith(".jpg")
    else:
        assert md.image_ids[0].endswith(".jpg")
        # every eval id has at least one box and a positive size
        for iid in md.image_ids:
            assert len(md.boxes[iid]) >= 1
            w, h = md.sizes[iid]
            assert w > 0 and h > 0


@pytest.mark.parametrize("split,n_overflow", [("val", 8), ("test", 5)])
def test_real_boxes_sane_vs_image_sizes(meta_root, split, n_overflow):
    """Real-data quirk pinned here: a handful of GT boxes overflow the
    image bounds by up to ~5 px (the upstream .mat sticks annotations are
    temporally interpolated; the reference never clamps them —
    resize_bbox just scales, wsol_metrics.py:287-293).  The reader must
    pass them through unclamped."""
    md = load_split_metadata(meta_root, split)
    overflowing = 0
    for iid in md.image_ids:
        w, h = md.sizes[iid]
        for x0, y0, x1, y1 in md.boxes[iid]:
            assert x0 < x1 and y0 < y1, (iid, (x0, y0, x1, y1))
            ov = max(-x0, -y0, x1 - w, y1 - h, 0.0)
            assert ov <= 5.0, (iid, ov)
            overflowing += ov > 1e-6
        rs = resized_gt_boxes(md, iid, 224)
        assert rs.shape == (len(md.boxes[iid]), 4)
        # proportional overflow survives the resize, nothing more
        assert (rs >= -224 * 0.05).all() and (rs <= 224 * 1.05).all()
    assert overflowing == n_overflow


def test_real_demo_split_parses(meta_root):
    md = load_split_metadata(meta_root, "test-video-demo")
    assert len(md.image_ids) == 134119
    assert set(md.labels[i] for i in md.image_ids) == set(range(10))
    # demo frames are the dense per-frame expansion of whole shots:
    # multiple frames share each shot directory
    shots = {i.rsplit("/", 1)[0] for i in md.image_ids}
    assert len(shots) < len(md.image_ids) / 10


def test_real_size_priors(meta_root):
    md = load_split_metadata(meta_root, "val")
    pri = build_size_priors(md, crop_size=224, num_classes=10)
    for k in ("min_h", "min_w", "min_s", "max_h", "max_w", "max_s"):
        assert pri[k].shape == (10,)
    # every class has boxes in the real val split -> informative priors
    assert (pri["min_s"] > 0).all()
    assert (pri["max_s"] <= 1.0 + 1e-6).all()
    assert (pri["min_h"] < pri["max_h"]).all()
    assert (pri["min_w"] < pri["max_w"]).all()
    # an object never fills zero area; real-world sanity on magnitudes
    assert float(pri["max_s"].max()) > 0.3


def test_shot_indexing_on_real_train_ids(meta_root, tmp_path):
    """Materialize a few REAL shot ids as directories with frame files and
    drive mode detection + frame indexing + per-epoch sampling through
    the production dataset class (reference get_dataset_mode /
    index_frames_from_shots, wsol_loader.py:375-422)."""
    md_full = load_split_metadata(meta_root, "train")
    ids = md_full.image_ids[:8] + md_full.image_ids[-8:]
    data_root = tmp_path / "frames"
    for shot in ids:
        d = data_root / shot
        d.mkdir(parents=True)
        for t in range(1, 4):
            (d / f"frame{t:04d}.jpg").touch()
    md = load_split_metadata(meta_root, "train", image_ids=ids)
    ds = WSOLVideoDataset(md, str(data_root), "train", C.YTOV1,
                          PairedTransform(256, 224, train=True),
                          KeyChain(0))
    assert ds.mode == C.DS_SHOTS
    assert len(ds) == 16
    for shot in ids:
        frames = ds.index_of_frames[shot]
        assert len(frames) == 3
        assert frames == sorted(frames)
        for fr in frames:
            assert ds.frame_to_shot[fr] == shot
    # per-epoch random frame-per-shot sampling resolves to real frames
    ds.set_epoch(0)
    for idx in range(len(ds)):
        (fid,) = ds.sample_ids(idx)
        assert fid in ds.frame_to_shot
    # different epochs resample (some shot picks a different frame)
    picks0 = [ds.sample_ids(i)[0] for i in range(len(ds))]
    ds.set_epoch(1)
    picks1 = [ds.sample_ids(i)[0] for i in range(len(ds))]
    assert picks0 != picks1
