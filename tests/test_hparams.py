"""Config-system tests: CLI overrides, coercion, derived fields, yaml."""
import os

import pytest
import yaml

from tcam_wsol_video_tpu.core import constants as C
from tcam_wsol_video_tpu.core.hparams import (HParams, dump_config,
                                              experiment_tag, finalize,
                                              get_config, parse_args)


def test_parse_args_coercion():
    args = parse_args([
        "--dataset", C.YTOV1, "--task", "STD_CL",
        "--lr", "0.01", "--batch_size", "16",
        "--multi_contour_eval", "false",
        "--iou_threshold_list", "[30, 50]",
    ])
    assert args.lr == 0.01 and isinstance(args.lr, float)
    assert args.batch_size == 16 and isinstance(args.batch_size, int)
    assert args.multi_contour_eval is False
    assert args.iou_threshold_list == [30, 50]


def test_tcam_clip_batch_division():
    """batch_size //= 2*knn_tc+1 (reference parseit.py:641-645)."""
    cfg = get_config(C.YTOV1)
    cfg.update(task=C.TCAM, arch=C.UNETTCAM, knn_tc=1, batch_size=32,
               sl_tc=True)
    args = finalize(HParams(cfg))
    assert args.batch_size == 10


def test_method_pooling_mismatch_rejected():
    cfg = get_config(C.YTOV1)
    cfg.update(task=C.STD_CL, method=C.METHOD_CAM, spatial_pooling=C.GAP)
    with pytest.raises(AssertionError):
        finalize(HParams(cfg))


def test_experiment_tag_format():
    args = finalize(HParams(get_config(C.YTOV1)))
    assert experiment_tag(args) == (
        "YouTube-Objects-v1.0-resnet50-CAM-WGAP-"
        "cp_best_localization-boxv2_True")


def test_config_yaml_roundtrip(tmp_path):
    args = finalize(HParams(get_config(C.YTOV1)))
    path = str(tmp_path / "config.yml")
    dump_config(args, path)
    with open(path) as f:
        loaded = yaml.safe_load(f)
    assert loaded["dataset"] == C.YTOV1
    assert loaded["crf_tc_sigma_xy"] == 100.0

    # yaml file as a base layer for CLI parsing
    args2 = parse_args(["--dataset", C.YTOV1, "--config", path,
                        "--lr", "0.5"])
    assert args2.lr == 0.5
    assert args2.crf_tc_sigma_rgb == 15.0


def test_defaults_match_reference_recipe_keys():
    """Spot-check reference defaults survive (config.py:289-473)."""
    cfg = get_config(C.YTOV1)
    assert cfg["elb_init_t"] == 1.0
    assert cfg["elb_max_t"] == 10.0
    assert cfg["elb_mulcoef"] == 1.01
    assert cfg["crf_tc_lambda"] == 2e-9
    assert cfg["crf_tc_sigma_rgb"] == 15.0
    assert cfg["crf_tc_sigma_xy"] == 100.0
    assert cfg["sl_tc_min_p"] == 0.2
    assert cfg["seg_ignore_idx"] == -255
    assert cfg["cam_curve_interval"] == 0.001
    assert cfg["iou_threshold_list"] == [30, 50, 70]


def test_param_group_labels():
    """Classifier-rate groups (reference _get_model_params_for_opt,
    instantiators.py:746-808): resnet layer4 + heads at lr_classifier_ratio,
    inception SPG blocks likewise."""
    from tcam_wsol_video_tpu.engine.optim import param_group_labels
    params = {
        "encoder": {"layer1_0": {"conv1": {"kernel": 0}},
                    "layer4_2": {"conv3": {"kernel": 0}}},
        "classification_head": {"fc": {"kernel": 0, "bias": 0}},
        "decoder": {"block_0": {"conv1": {"kernel": 0}}},
    }
    labels = param_group_labels(params, "resnet50")
    assert labels["encoder"]["layer1_0"]["conv1"]["kernel"] == "base"
    assert labels["encoder"]["layer4_2"]["conv3"]["kernel"] == "head"
    assert labels["classification_head"]["fc"]["kernel"] == "head"
    assert labels["decoder"]["block_0"]["conv1"]["kernel"] == "base"

    params_i = {"encoder": {"Mixed_6e": {"branch1x1": {"conv": {"kernel": 0}}},
                            "SPG_A3_2b": {"conv": {"kernel": 0}}},
                "classification_head": {"fc": {"kernel": 0}}}
    labels_i = param_group_labels(params_i, "inceptionv3")
    assert labels_i["encoder"]["Mixed_6e"]["branch1x1"]["conv"]["kernel"] \
        == "base"
    assert labels_i["encoder"]["SPG_A3_2b"]["conv"]["kernel"] == "head"


def test_lr_schedules():
    from tcam_wsol_video_tpu.engine.lr import cosine_lr, step_lr
    f = step_lr(0.01, step_size=2, gamma=0.1, min_lr=1e-5)
    assert f(0) == 0.01 and f(1) == 0.01
    assert f(2) == pytest.approx(0.001)
    assert f(100) == 1e-5                      # floor
    g = cosine_lr(0.01, t_max=10, min_lr=1e-5)
    assert g(0) == pytest.approx(0.01)
    assert g(10) == pytest.approx(1e-5)
    assert 1e-5 < g(5) < 0.01


def test_reference_readme_command_pastes_in():
    """The verbatim TCAM command from the reference README
    (/root/reference/README.md:280-339) must parse: --opt__* flags map
    to our optimizer keys, torchrun/CUDA runtime flags are accepted and
    dropped with one warning."""
    import shlex
    import warnings

    cmd = (
        "--local_world_size=1 --task TCAM --encoder_name resnet50 "
        "--arch UnetTCAM --opt__name_optimizer sgd --dist_backend gloo "
        "--batch_size 32 --max_epochs 100 --checkpoint_save 100 "
        "--keep_last_n_checkpoints 10 --freeze_cl True "
        "--support_background True --method CAM --spatial_pooling WGAP "
        "--dataset YouTube-Objects-v1.0 --box_v2_metric False --cudaid 0 "
        "--amp True --plot_tr_cam_progress False --opt__lr 0.01 "
        "--opt__step_size 15 --opt__gamma 0.9 --opt__weight_decay 0.0001 "
        "--elb_init_t 1.0 --elb_max_t 10.0 --elb_mulcoef 1.01 "
        "--sl_tc True --sl_tc_knn 1 --sl_tc_knn_mode before "
        "--sl_tc_knn_t 0.0 --sl_tc_knn_epoch_switch_uniform -1 "
        "--sl_tc_min_t 0.0 --sl_tc_lambda 1.0 --sl_tc_min 1 --sl_tc_max 1 "
        "--sl_tc_ksz 3 --sl_tc_max_p 0.6 --sl_tc_min_p 0.1 "
        "--sl_tc_seed_tech seed_weighted --sl_tc_use_roi True "
        "--sl_tc_roi_method roi_all --sl_tc_roi_min_size 0.05 "
        "--crf_tc True --crf_tc_lambda 2e-09 --crf_tc_sigma_rgb 15.0 "
        "--crf_tc_sigma_xy 100.0 --crf_tc_scale 1.0 --max_sizepos_tc True "
        "--max_sizepos_tc_lambda 0.01 --size_bg_g_fg_tc False "
        "--empty_out_bb_tc False --sizefg_tmp_tc False --knn_tc 0 "
        "--rgb_jcrf_tc False --exp_id x")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        args = parse_args(shlex.split(cmd))
    assert args.opt_name == "sgd"
    assert args.lr == 0.01
    assert args.step_size == 15
    assert args.gamma == 0.9
    assert args.weight_decay == 0.0001
    assert args.lr_scheduler == "mystep"      # reference default kept
    assert args.sl_tc and args.crf_tc and args.crf_tc_lambda == 2e-09
    dropped = [x for x in w if "accepted and ignored" in str(x.message)]
    assert len(dropped) == 1
    for f in ("amp", "cudaid", "dist_backend", "local_world_size"):
        assert f in str(dropped[0].message)


def test_reference_scheduler_spellings():
    """--opt__name_lr_scheduler renames; --opt__lr_scheduler False maps
    to the constant schedule; torch 'step' (no min_lr floor) builds."""
    from tcam_wsol_video_tpu.engine.lr import build_lr_fn

    a = parse_args(["--task", "STD_CL",
                    "--opt__name_lr_scheduler", "cosine",
                    "--opt__t_max", "20"])
    assert a.lr_scheduler == "cosine" and a.t_max == 20

    b = parse_args(["--task", "STD_CL", "--opt__lr_scheduler", "False",
                    "--opt__lr", "0.25"])
    assert b.lr_scheduler == "constant"
    fb = build_lr_fn(b)
    assert fb(0) == fb(99) == 0.25

    c = parse_args(["--task", "STD_CL", "--opt__name_lr_scheduler",
                    "step", "--opt__lr", "0.01", "--opt__step_size", "2",
                    "--opt__gamma", "0.1", "--opt__min_lr", "1e-5"])
    fc = build_lr_fn(c)
    assert fc(0) == 0.01
    assert fc(2) == pytest.approx(1e-3)
    assert fc(100) < 1e-5                      # NO floor: decays past min_lr


def test_eval_cli_missing_exp_dir_fails_fast(tmp_path):
    """eval.py with a nonexistent --exp_dir must die on the 'no best
    model' assert (before any model init / XLA compile), not a
    stack-less crash (reference eval.py is broken upstream; ours is a
    supported surface)."""
    import pytest
    from tcam_wsol_video_tpu.data.synthetic import make_synthetic_dataset
    from tcam_wsol_video_tpu.cli import evaluate

    out = make_synthetic_dataset(str(tmp_path))
    argv = ["--exp_dir", str(tmp_path / "nonexistent"),
            "--split", "test",
            "--dataset", "YouTube-Objects-v1.0", "--task", "STD_CL",
            "--data_root", str(tmp_path),
            "--metadata_root", out["metadata_root"],
            "--crop_size", "32", "--resize_size", "40"]
    with pytest.raises(AssertionError, match="no best model"):
        evaluate.main(argv)
