"""Device-resident train data plane (data/device_feed.DeviceTrainFeed):
the HBM-pool assembly must replay the streamed pipeline's epochs —
identical sampling/aug streams, bit-identical uint8 pixels (vs the
decode-cache uint8 posture), CAM/ROI sides matching to float rounding.
"""
import numpy as np
import pytest

import jax

from tcam_wsol_video_tpu.core import constants as C
from tcam_wsol_video_tpu.core.prng import KeyChain
from tcam_wsol_video_tpu.data.cam_store import CamStore
from tcam_wsol_video_tpu.data.dataset import WSOLVideoDataset
from tcam_wsol_video_tpu.data.folds import load_split_metadata
from tcam_wsol_video_tpu.data.pipeline import DataPipeline
from tcam_wsol_video_tpu.data.synthetic import make_synthetic_dataset
from tcam_wsol_video_tpu.data.transforms import PairedTransform


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_devfeed")
    return make_synthetic_dataset(str(root))


@pytest.fixture(scope="module")
def store(synth, tmp_path_factory):
    """A synthetic stage-1 CAM store: smooth blobs + stored thresholds."""
    sd = str(tmp_path_factory.mktemp("cam_store"))
    st = CamStore(sd)
    kc = KeyChain(7)
    md = load_split_metadata(synth["metadata_root"], "train")
    ds = WSOLVideoDataset(md, synth["data_root"], "train", C.YTOV1,
                          PairedTransform(40, 32, train=True), kc,
                          crop_size=32)
    rng = np.random.default_rng(3)
    th = {}
    yy, xx = np.mgrid[0:12, 0:12].astype(np.float32)
    for frames in ds.index_of_frames.values():
        for fid in frames:
            cy, cx = rng.uniform(3, 9, 2)
            cam = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 8.0)
            st.save_cam(fid, cam.astype(np.float32))
            th[fid] = float(rng.uniform(0.3, 0.6))
    st.save_thresholds(th)
    return CamStore(sd)


def _make(synth, store, kc, sl_tc_knn=1, use_roi=True, dev_mb=0,
          decode_cache_mb=0):
    md = load_split_metadata(synth["metadata_root"], "train")
    ds = WSOLVideoDataset(
        md, synth["data_root"], "train", C.YTOV1,
        PairedTransform(40, 32, train=True), kc, crop_size=32,
        cam_store=store, sl_tc_knn=sl_tc_knn,
        sl_tc_knn_mode=C.TIME_BEFORE_AFTER if sl_tc_knn else C.TIME_INSTANT,
        use_roi=use_roi)
    pipe = DataPipeline(ds, 4, kc, shuffle=True, num_workers=1,
                        compact=True, decode_cache_mb=decode_cache_mb,
                        train_device_cache_mb=dev_mb)
    return ds, pipe


@pytest.mark.parametrize("sl_tc_knn", [0, 1])
def test_device_feed_replays_streamed_epoch(synth, store, sl_tc_knn):
    from tcam_wsol_video_tpu.data import native_loader
    from tcam_wsol_video_tpu.engine.steps import expand_compact_batch

    _, pipe_s = _make(synth, store, KeyChain(0), sl_tc_knn=sl_tc_knn,
                      decode_cache_mb=64)
    _, pipe_d = _make(synth, store, KeyChain(0), sl_tc_knn=sl_tc_knn,
                      dev_mb=256)
    assert pipe_d._device_feed is not None and pipe_d._device_feed.enabled

    for epoch in (0, 1):
        for bs, bd in zip(pipe_s.epoch(epoch), pipe_d.epoch(epoch)):
            assert bs["image_id"] == bd["image_id"]
            np.testing.assert_array_equal(bs["label"],
                                          np.asarray(bd["label"]))
            np.testing.assert_array_equal(bs["valid"],
                                          np.asarray(bd["valid"]))
            np.testing.assert_array_equal(bs["seq_iter"],
                                          np.asarray(bd["seq_iter"]))
            # pixels: bit-identical to the decode-cache uint8 posture
            # when BOTH sides crop from the same uint8 resize frames
            # (native path); the PIL fallback resizes with antialias on
            # the streamed side only — compare with a tolerance there
            if native_loader.available():
                np.testing.assert_array_equal(bs["raw_u8"],
                                              np.asarray(bd["raw_u8"]))
            else:
                assert (np.abs(bs["raw_u8"].astype(int)
                               - np.asarray(bd["raw_u8"]).astype(int))
                        <= 1).mean() > 0.99
            # CAM side: streamed ships u16-quantized host-matrix values;
            # device fuses/resizes in f32 on device
            cam_s = bs["std_cam_u16"].astype(np.float32) / 65535.0
            np.testing.assert_allclose(np.asarray(bd["std_cam"]), cam_s,
                                       atol=2e-4)
            # ROI decisions are integer: require near-perfect agreement
            # (float rounding can flip threshold-boundary pixels only)
            roi_s = bs["roi"].astype(np.int32)
            roi_d = np.asarray(bd["roi"])
            assert (roi_s == roi_d).mean() > 0.995
            np.testing.assert_allclose(np.asarray(bd["fg_size"]),
                                       bs["fg_size"], atol=2e-3)
            # the assembled batch feeds the SAME expand path the train
            # step applies to compact batches
            exp = expand_compact_batch(
                {k: v for k, v in bd.items() if k != "image_id"})
            assert exp["image"].shape == (bs["raw_u8"].shape[0], 32, 32, 3)


def test_device_feed_disabled_over_budget_and_for_eval(synth, store):
    from tcam_wsol_video_tpu.data.device_feed import DeviceTrainFeed
    _, pipe = _make(synth, store, KeyChain(0), dev_mb=0)
    feed = DeviceTrainFeed(pipe, budget_mb=0)   # pool > 0 bytes budget
    assert not feed.enabled

    md = load_split_metadata(synth["metadata_root"], "val")
    ds = WSOLVideoDataset(md, synth["data_root"], "val", C.YTOV1,
                          PairedTransform(40, 32, train=False),
                          KeyChain(0), crop_size=32)
    pipe_e = DataPipeline(ds, 8, KeyChain(0), shuffle=False,
                          num_workers=1, train_device_cache_mb=256)
    assert pipe_e._device_feed is None  # train-only data plane


def test_device_feed_trains_end_to_end(synth, store):
    """One Trainer epoch through the device feed learns and logs like the
    streamed path (full train_step consumption of the assembled batch)."""
    import os

    from tcam_wsol_video_tpu.core.hparams import (HParams, finalize,
                                                  get_config)
    from tcam_wsol_video_tpu.engine.trainer import Trainer
    from tcam_wsol_video_tpu.models.factory import create_model_from_args

    cfg = get_config(C.YTOV1)
    cfg.update(task=C.TCAM, arch=C.UNETTCAM, crop_size=32, resize_size=40,
               batch_size=4, eval_batch_size=8, max_epochs=1,
               num_workers=1, compute_dtype="float32", checkpoint_save=0,
               cam_curve_interval=0.05, mesh_dp=1, log_every=0,
               fast_eval=False, sl_tc=True, sl_tc_max=2, sl_tc_min=2,
               sl_tc_use_roi=True, max_sizepos_tc=True,
               h2d_transfer="uint8", train_device_cache_mb=256,
               data_root=os.path.dirname(synth["data_root"]),
               metadata_root=synth["metadata_root"],
               outd="/tmp/devfeed_exp", exp_id="t1")
    args = finalize(HParams(cfg))
    kc = KeyChain(0)
    ds, pipe = _make(synth, store, kc, sl_tc_knn=1, use_roi=True,
                     dev_mb=256)
    md_v = load_split_metadata(synth["metadata_root"], "val")
    ds_v = WSOLVideoDataset(md_v, synth["data_root"], "val", C.YTOV1,
                            PairedTransform(40, 32, train=False), kc,
                            crop_size=32)
    eval_pipes = {"val": (ds_v, DataPipeline(ds_v, 8, kc, shuffle=False,
                                             num_workers=1)),
                  "test": (ds_v, DataPipeline(ds_v, 8, kc, shuffle=False,
                                              num_workers=1))}
    model = create_model_from_args(args)
    tr = Trainer(args, model, pipe, eval_pipes, keychain=kc)
    out0 = tr.train_epoch(0)
    assert np.isfinite(out0["loss"])
    res = tr.evaluate(0, "val")
    assert 0.0 <= res["localization"] <= 100.0
    # every frame the epoch touched is now resident; epoch 2 uploads none
    feed = pipe._device_feed
    touched = int(feed.resident.sum())
    assert touched > 0
    before = feed.resident.copy()
    out1 = tr.train_epoch(1)
    assert np.isfinite(out1["loss"])
    # epoch 2 may touch NEW frames (random frame per shot) but never
    # re-uploads resident ones
    assert (feed.resident & before).sum() == before.sum()
