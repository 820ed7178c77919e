"""Two-stage pipeline integration: stage-1 classifier -> CAM store dump ->
TCAM training with self-learning + CRF + size losses (+ the best-student
epoch switch), mirroring SURVEY.md §3.4."""
import os

import jax
import numpy as np
import pytest

from tcam_wsol_video_tpu.core import constants as C
from tcam_wsol_video_tpu.core.hparams import HParams, finalize, get_config
from tcam_wsol_video_tpu.core.prng import KeyChain
from tcam_wsol_video_tpu.data.cam_store import CamStore
from tcam_wsol_video_tpu.data.dataset import WSOLVideoDataset
from tcam_wsol_video_tpu.data.folds import load_split_metadata
from tcam_wsol_video_tpu.data.pipeline import DataPipeline
from tcam_wsol_video_tpu.data.synthetic import make_synthetic_dataset
from tcam_wsol_video_tpu.data.transforms import PairedTransform


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_tcam")
    return make_synthetic_dataset(str(root))


def _args(task, synth, **over):
    cfg = get_config(C.YTOV1)
    cfg.update(task=task,
               arch=(C.STDCLASSIFIER if task == C.STD_CL else C.UNETTCAM),
               crop_size=32, resize_size=40, batch_size=4,
               eval_batch_size=8, max_epochs=1, num_workers=2,
               compute_dtype="float32", checkpoint_save=0,
               cam_curve_interval=0.05, mesh_dp=1, log_every=0, fast_eval=False,
               data_root=os.path.dirname(synth["data_root"]),
               metadata_root=synth["metadata_root"])
    cfg.update(over)
    return finalize(HParams(cfg))


def _pipes(args, synth, kc, knn_tc=0, cam_store=None, use_roi=False):
    md_tr = load_split_metadata(synth["metadata_root"], "train")
    ds_tr = WSOLVideoDataset(
        md_tr, synth["data_root"], "train", C.YTOV1,
        PairedTransform(40, 32, train=True), kc, crop_size=32,
        cam_store=cam_store, knn_tc=knn_tc, use_roi=use_roi,
        roi_method=args.sl_tc_roi_method)
    pipe_tr = DataPipeline(ds_tr, args.batch_size, kc, num_workers=2)
    eval_pipes = {}
    for split in ("val", "test"):
        md = load_split_metadata(synth["metadata_root"], split)
        ds = WSOLVideoDataset(md, synth["data_root"], split, C.YTOV1,
                              PairedTransform(40, 32, train=False), kc,
                              crop_size=32)
        eval_pipes[split] = (ds, DataPipeline(ds, 8, kc, shuffle=False,
                                              num_workers=2))
    return pipe_tr, eval_pipes


def test_two_stage_pipeline(synth, tmp_path_factory):
    from tcam_wsol_video_tpu.cli.dump_cams import dump_cams
    from tcam_wsol_video_tpu.engine.trainer import Trainer
    from tcam_wsol_video_tpu.models.factory import create_model_from_args

    out_root = str(tmp_path_factory.mktemp("exps"))
    kc = KeyChain(0)

    # ---- stage 1: STD_CL classifier
    args1 = _args(C.STD_CL, synth, outd=out_root, exp_id="s1", lr=0.05)
    pipe_tr, eval_pipes = _pipes(args1, synth, kc)
    model1 = create_model_from_args(args1)
    tr1 = Trainer(args1, model1, pipe_tr, eval_pipes, keychain=kc)
    tr1.train_epoch(0)
    res1 = tr1.evaluate(0, "val")
    tr1.model_selection(0, res1)
    exp1_dir = tr1.outd
    assert os.path.isdir(os.path.join(exp1_dir, C.BEST_LOC))

    # ---- CAM store dump (the stage-1 -> stage-2 handoff)
    store_dir = str(tmp_path_factory.mktemp("cam_store"))
    store = dump_cams(args1, exp1_dir, store_dir, cam_size=16,
                      batch_size=8)
    md_tr = load_split_metadata(synth["metadata_root"], "train")
    ds_probe = WSOLVideoDataset(
        md_tr, synth["data_root"], "train", C.YTOV1,
        PairedTransform(40, 32, train=False), kc, crop_size=32)
    n_frames = sum(len(v) for v in ds_probe.index_of_frames.values())
    assert len(store.thresholds) == n_frames
    some_frame = next(iter(store.thresholds))
    cam = store.load_cam(some_frame)
    assert cam.shape == (16, 16)
    assert 0.0 <= cam.min() and cam.max() <= 1.0

    # uint8-H2D dump (normalize-on-device) must reproduce the f32 dump:
    # both paths start from the same decoded uint8 pixels, so the CAMs
    # agree to float rounding (PARITY.md round-3 H2D compaction)
    store_dir_u8 = str(tmp_path_factory.mktemp("cam_store_u8"))
    args1_u8 = args1.replace(h2d_transfer="uint8")
    store_u8 = dump_cams(args1_u8, exp1_dir, store_dir_u8, cam_size=16,
                         batch_size=8)
    assert store_u8.thresholds == store.thresholds
    for fid in list(store.thresholds)[:8]:
        np.testing.assert_allclose(store_u8.load_cam(fid),
                                   store.load_cam(fid), atol=1e-4)

    # ---- stage 2: TCAM with sl + size losses + student epoch switch
    args2 = _args(C.TCAM, synth, outd=out_root, exp_id="s2", lr=0.01,
                  sl_tc=True, sl_tc_max=4, sl_tc_min=4, sl_tc_use_roi=True,
                  max_sizepos_tc=True, max_sizepos_tc_lambda=0.01,
                  size_bg_g_fg_tc=True, freeze_cl=False,
                  sl_tc_epoch_switch_to_sl=1,
                  std_cams_folder=store_dir)
    pipe_tr2, eval_pipes2 = _pipes(args2, synth, kc,
                                   cam_store=CamStore(store_dir),
                                   use_roi=True)
    model2 = create_model_from_args(args2)
    tr2 = Trainer(args2, model2, pipe_tr2, eval_pipes2, keychain=kc)

    m0 = tr2.train_epoch(0)           # seeds from stored classifier CAMs
    assert np.isfinite(m0["loss"])
    res2 = tr2.evaluate(0, "val")
    tr2.model_selection(0, res2)
    assert tr2.best_loc_variables is not None

    m1 = tr2.train_epoch(1)           # epoch switch: best-student seeds
    assert np.isfinite(m1["loss"])
    assert tr2._student_step is not None, "epoch switch did not engage"

    res_final = tr2.evaluate(1, "test")
    assert 0.0 <= res_final["localization"] <= 100.0


def test_tcam_with_temporal_crf(synth, tmp_path_factory):
    """Clip training (knn_tc=1) with the temporal joint color CRF and the
    spatial CRF — the full TCAM loss stack in one jitted step."""
    from tcam_wsol_video_tpu.engine.trainer import Trainer
    from tcam_wsol_video_tpu.models.factory import create_model_from_args

    out_root = str(tmp_path_factory.mktemp("exps2"))
    kc = KeyChain(1)
    args = _args(C.TCAM, synth, outd=out_root, exp_id="crf", lr=0.01,
                 batch_size=4, knn_tc=1,
                 sl_tc=True, sl_tc_max=4, sl_tc_min=4,
                 crf_tc=True, crf_tc_lambda=2e-9,
                 rgb_jcrf_tc=True, rgb_jcrf_tc_lambda=2e-9,
                 max_sizepos_tc=True, max_sizepos_tc_lambda=0.01)
    assert args.batch_size == 1  # 4 // (2*1+1)
    pipe_tr, eval_pipes = _pipes(args, synth, kc, knn_tc=1)
    model = create_model_from_args(args)
    tr = Trainer(args, model, pipe_tr, eval_pipes, keychain=kc)
    m = tr.train_epoch(0)
    assert np.isfinite(m["loss"])


def test_tcam_without_cam_store_recomputes_seeds(synth, tmp_path_factory):
    """No --std_cams_folder: seed CAMs rebuilt from the frozen classifier
    inside the jitted step (reference get_std_cams_minibatch)."""
    import jax
    from tcam_wsol_video_tpu.engine.trainer import Trainer
    from tcam_wsol_video_tpu.models.factory import (create_model_from_args,
                                                    init_model)

    out_root = str(tmp_path_factory.mktemp("exps3"))
    kc = KeyChain(2)
    args = _args(C.TCAM, synth, outd=out_root, exp_id="fly", lr=0.01,
                 sl_tc=True, sl_tc_max=4, sl_tc_min=4,
                 max_sizepos_tc=True, max_sizepos_tc_lambda=0.01)
    pipe_tr, eval_pipes = _pipes(args, synth, kc)   # no cam_store
    assert pipe_tr.ds.cam_store is None

    cls_model = create_model_from_args(args,
                                       override_arch_for_classifier=True)
    cls_vars = jax.device_get(init_model(cls_model, kc.key("cls"),
                                         (1, 32, 32, 3)))
    model = create_model_from_args(args)
    tr = Trainer(args, model, pipe_tr, eval_pipes, keychain=kc,
                 classifier=(cls_model, cls_vars))
    assert tr._recompute_cams
    m = tr.train_epoch(0)
    assert np.isfinite(m["loss"])


def test_native_campaired_matches_python_pipeline(synth, tmp_path_factory):
    """CAM-paired native path: the stored CAM undergoes exactly the native
    image decode's crop/flip — std_cam/roi must match the python path."""
    import shutil
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    from tcam_wsol_video_tpu.data import native_loader
    if not native_loader.available():
        pytest.skip("native loader unavailable")

    store_dir = str(tmp_path_factory.mktemp("store_np"))
    store = CamStore(store_dir)
    md_tr = load_split_metadata(synth["metadata_root"], "train")
    kc = KeyChain(4)
    probe = WSOLVideoDataset(md_tr, synth["data_root"], "train", C.YTOV1,
                             PairedTransform(40, 32, train=False), kc,
                             crop_size=32)
    rng = np.random.default_rng(0)
    ths = {}
    for frames in probe.index_of_frames.values():
        for fid in frames:
            cam = rng.random((16, 16)).astype(np.float32)
            store.save_cam(fid, cam)
            ths[fid] = 0.0
    store.save_thresholds(ths)

    args = _args(C.TCAM, synth, sl_tc=True, sl_tc_use_roi=True)

    def build(native):
        ds = WSOLVideoDataset(
            md_tr, synth["data_root"], "train", C.YTOV1,
            PairedTransform(40, 32, train=True), KeyChain(4), crop_size=32,
            cam_store=CamStore(store_dir), use_roi=True,
            roi_method=args.sl_tc_roi_method)
        pipe = DataPipeline(ds, 4, KeyChain(4), num_workers=1)
        if not native:
            pipe._native_fast_path_ok = lambda: False
        return next(iter(pipe.epoch(2)))

    b_native = build(True)
    b_python = build(False)
    assert b_native["image_id"] == b_python["image_id"]
    np.testing.assert_allclose(b_native["std_cam"], b_python["std_cam"],
                               atol=1e-6)
    np.testing.assert_array_equal(b_native["roi"], b_python["roi"])
    np.testing.assert_allclose(b_native["fg_size"], b_python["fg_size"],
                               atol=1e-6)
    # images: same geometry, different resize filter (native vs PIL)
    assert np.abs(b_native["raw_img"] - b_python["raw_img"]).mean() < 8.0


def test_native_clip_batches_match_python_pipeline(synth):
    """Clip batches (knn_tc > 0) through the native loader: clip-major
    layout, per-frame aug draws, seq/frm iters and validity must all
    match the python path (round-3: the native fast path now covers
    clips, VERDICT r2 missing #3)."""
    import shutil
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    from tcam_wsol_video_tpu.data import native_loader
    if not native_loader.available():
        pytest.skip("native loader unavailable")

    md_tr = load_split_metadata(synth["metadata_root"], "train")

    def build(native):
        ds = WSOLVideoDataset(
            md_tr, synth["data_root"], "train", C.YTOV1,
            PairedTransform(40, 32, train=True), KeyChain(4), crop_size=32,
            knn_tc=1)
        assert ds.clip_len == 3
        pipe = DataPipeline(ds, 4, KeyChain(4), num_workers=1)
        if not native:
            pipe._native_fast_path_ok = lambda: False
        return next(iter(pipe.epoch(1)))

    b_native = build(True)
    b_python = build(False)
    assert b_native["image_id"] == b_python["image_id"]
    assert b_native["label"].shape[0] == 12          # 4 clips x 3 frames
    np.testing.assert_array_equal(b_native["label"], b_python["label"])
    np.testing.assert_array_equal(b_native["seq_iter"],
                                  b_python["seq_iter"])
    np.testing.assert_array_equal(b_native["frm_iter"],
                                  b_python["frm_iter"])
    np.testing.assert_array_equal(b_native["valid"], b_python["valid"])
    # same geometry per frame, different resize filter (native vs PIL)
    assert np.abs(b_native["raw_img"] - b_python["raw_img"]).mean() < 8.0
