"""C_BOX task end-to-end: DenseBoxNet training with the frozen-classifier
scoring loop + box-prediction evaluation."""
import os

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
    return make_synthetic_dataset(str(tmp_path_factory.mktemp("synth_cb")))


def test_cbox_train_and_eval(synth, tmp_path_factory):
    from tcam_wsol_video_tpu.engine.trainer import Trainer
    from tcam_wsol_video_tpu.models.factory import (create_model_from_args,
                                                    init_model)
    import jax

    cfg = get_config(C.YTOV1)
    cfg.update(task=C.C_BOX, arch=C.DENSEBOXNET, crop_size=32,
               resize_size=40, batch_size=4, eval_batch_size=8,
               max_epochs=1, num_workers=2, compute_dtype="float32",
               checkpoint_save=0, cam_curve_interval=0.05, mesh_dp=1, log_every=0,
               fast_eval=False, lr=0.01,
               cb_area_box=True, cb_cl_score=True, cb_seed=True,
               cb_pp_box=True, cb_seed_n=4, cb_seed_erode_iter=0,
               cb_cl_score_blur_ksize=9, cb_cl_score_blur_sigma=4.0,
               outd=str(tmp_path_factory.mktemp("exps")), exp_id="cb",
               data_root=os.path.dirname(synth["data_root"]),
               metadata_root=synth["metadata_root"])
    args = finalize(HParams(cfg))
    kc = KeyChain(0)

    # tiny CAM store with centered blobs (stage-1 stand-in)
    store_dir = str(tmp_path_factory.mktemp("store_cb"))
    store = CamStore(store_dir)
    md_tr = load_split_metadata(synth["metadata_root"], "train")
    probe = WSOLVideoDataset(md_tr, synth["data_root"], "train", C.YTOV1,
                             PairedTransform(40, 32, train=False), kc,
                             crop_size=32)
    cam = np.zeros((16, 16), np.float32)
    cam[4:12, 4:12] = 0.9
    for frames in probe.index_of_frames.values():
        for fid in frames:
            store.save_cam(fid, cam)

    ds_tr = WSOLVideoDataset(md_tr, synth["data_root"], "train", C.YTOV1,
                             PairedTransform(40, 32, train=True), kc,
                             crop_size=32, cam_store=store)
    pipe_tr = DataPipeline(ds_tr, args.batch_size, kc, num_workers=2)
    eval_pipes = {}
    for split in ("val", "test"):
        md = load_split_metadata(synth["metadata_root"], split)
        ds = WSOLVideoDataset(md, synth["data_root"], split, C.YTOV1,
                              PairedTransform(40, 32, train=False), kc,
                              crop_size=32)
        eval_pipes[split] = (ds, DataPipeline(ds, 8, kc, shuffle=False,
                                              num_workers=2))

    # frozen classifier (random init suffices to exercise the loop)
    cls_model = create_model_from_args(args,
                                       override_arch_for_classifier=True)
    cls_vars = jax.device_get(init_model(cls_model, kc.key("cls"),
                                         (1, 32, 32, 3)))

    model = create_model_from_args(args)
    trainer = Trainer(args, model, pipe_tr, eval_pipes, keychain=kc,
                      classifier=(cls_model, cls_vars))
    m = trainer.train_epoch(0)
    assert np.isfinite(m["loss"])

    # C_BOX evaluation goes through the bbox path of the BoxEvaluator
    from tcam_wsol_video_tpu.engine.evaluator import CamEvaluator
    ev = CamEvaluator(model, args, eval_pipes["val"][0],
                      eval_pipes["val"][1], "val",
                      classifier=(cls_model, cls_vars))
    res = ev.run(trainer.state.variables(), kc.key("ev"))
    assert 0.0 <= res["localization"] <= 100.0
    assert "classification" in res


def test_cbox_through_the_cli(synth, tmp_path_factory):
    """C_BOX through the real CLIs: STD_CL stage 1 via train.main, then
    main.py --task C_BOX --arch DenseBoxNet with
    --folder_pre_trained_cl, then eval.py on the result.  Pins the
    encoder-only pretrained merge (DenseBoxNet has no
    classification_head; the reference's loader likewise moves only
    the encoder onto the boxnet, instantiators.py:588-617) — the
    Trainer-level test above never exercised the CLI weight-loading
    path."""
    from tcam_wsol_video_tpu.cli import evaluate, train

    exps = str(tmp_path_factory.mktemp("exps_cbox_cli"))
    common = ["--dataset", "YouTube-Objects-v1.0",
              "--data_root", os.path.dirname(synth["data_root"]),
              "--metadata_root", synth["metadata_root"],
              "--crop_size", "32", "--resize_size", "40",
              "--batch_size", "4", "--eval_batch_size", "8",
              "--cam_curve_interval", "0.05", "--checkpoint_save", "0",
              "--num_workers", "1", "--outd", exps]
    train.main(common + ["--task", "STD_CL", "--max_epochs", "1",
                         "--exp_id", "s1"])
    tag = ("YouTube-Objects-v1.0-resnet50-CAM-WGAP-"
           "cp_best_localization-boxv2_True")
    s1 = os.path.join(exps, tag, "s1")
    res = train.main(common + [
        "--task", "C_BOX", "--arch", "DenseBoxNet", "--max_epochs", "1",
        "--lr", "0.001", "--cb_area_box", "True", "--cb_cl_score", "True",
        "--cb_seed", "True", "--cb_pp_box", "True", "--cb_seed_n", "4",
        "--cb_seed_erode_iter", "0", "--cb_cl_score_blur_ksize", "9",
        "--cb_cl_score_blur_sigma", "4.0",
        "--folder_pre_trained_cl", s1, "--exp_id", "cb"])
    for k in ("localization", "maxboxacc_50", "classification"):
        assert np.isfinite(res["best_localization"][k])
    out = evaluate.main(common + [
        "--task", "C_BOX", "--arch", "DenseBoxNet",
        "--exp_dir", os.path.join(exps, tag, "cb"), "--split", "test"])
    assert 0.0 <= out["localization"] <= 100.0
