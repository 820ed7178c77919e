"""Config system: per-dataset defaults + CLI overrides -> frozen HParams.

Capability parity with the reference's three-tier flag system
(/root/reference/dlib/configure/config.py:78-569 defaults,
/root/reference/dlib/process/parseit.py:82-938 argparse overrides,
Dict2Obj freeze).  Re-designed: one flat default dict per dataset, a typed
attribute-access container, YAML round-trip, and derived-field resolution
(output dir tag, fast-eval interval, TCAM batch split) done in
`finalize()` instead of scattered asserts.
"""
from __future__ import annotations

import argparse
import copy
import hashlib
import os
from typing import Any, Dict, Optional

import yaml

from tcam_wsol_video_tpu.core import constants


class HParams:
    """Attribute-access view over a flat config dict (reference Dict2Obj,
    /root/reference/dlib/process/parseit.py)."""

    def __init__(self, d: Dict[str, Any]):
        object.__setattr__(self, "_d", dict(d))

    def __getattr__(self, k):
        try:
            return self._d[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self._d[k] = v

    def __contains__(self, k):
        return k in self._d

    def get(self, k, default=None):
        return self._d.get(k, default)

    def to_dict(self) -> Dict[str, Any]:
        return copy.deepcopy(self._d)

    def replace(self, **kw) -> "HParams":
        d = self.to_dict()
        d.update(kw)
        return HParams(d)

    def __repr__(self):
        return f"HParams({self._d!r})"


def get_root_datasets_dir() -> str:
    """Dataset root resolution via env var (reference config.py:33-69 uses
    host-specific roots; we standardize on one env var with a sane default).
    """
    return os.environ.get("TCAM_TPU_DATA_ROOT", os.path.expanduser("~/datasets"))


def get_config(dataset: str) -> Dict[str, Any]:
    """Every hyperparameter with its default, keyed identically to the
    reference where a counterpart exists (config.py:78-569), so recipes
    written for the reference translate 1:1."""
    assert dataset in constants.DATASETS, dataset

    num_classes = constants.NUMBER_CLASSES[dataset]

    cfg: Dict[str, Any] = {
        # ----------------------------------------------------- experiment
        "dataset": dataset,
        "num_classes": num_classes,
        "crop_size": constants.CROP_SIZE,
        "resize_size": constants.RESIZE_SIZE,
        "batch_size": 32,
        "eval_batch_size": 64,
        "max_epochs": 150,
        "seed": 0,
        "exp_id": "exp",
        "outd": "exps",                 # experiments output root
        "data_root": get_root_datasets_dir(),
        "metadata_root": constants.RELATIVE_META_ROOT,
        "std_cams_folder": "",          # stage-1 CAM store (TCAM input)
        "num_workers": 4,
        "proxy_training_set": False,    # train on image_ids_proxy.txt
        "num_val_sample_per_class": 0,  # mini-val: n ids/class (0 = all)
        "mask_root": "",                # OpenImages GT-mask tree
                                        # ("" = under data_root)
        # bucketed train-set streaming (ILSVRC only): the train split is
        # pre-chunked into nbr_chunks metadata files grouped into buckets
        # of bucket_sz; the trainer iterates buckets per epoch (reference
        # config.py:115-118, constants.py:208-222)
        "ds_chunkable": dataset in constants.BUCKETED_DATASETS,
        "nbr_chunks": (240 if dataset in constants.BUCKETED_DATASETS
                       else -1),
        "bucket_sz": 8,
        # shell templates run around each bucket ({bucket} substituted):
        # the CLI analogue of the reference's prepare_next_bucket /
        # delete_train staging (ilsvrc_manager.py:296-416); "" = no-op
        "bucket_stage_cmd": "",
        "bucket_cleanup_cmd": "",
        "checkpoint_save": 100,         # steps between rolling checkpoints
        "keep_last_n_checkpoints": 1,
        "save_dir_models": "",

        # ----------------------------------------------------------- eval
        "cam_curve_interval": 0.001,    # test sweep (config.py:145)
        "multi_contour_eval": True,     # box_v2 protocol
        "multi_iou_eval": True,
        "iou_threshold_list": [30, 50, 70],
        "box_v2_metric": True,
        "eval_checkpoint_type": constants.BEST_LOC,
        "fast_eval": True,              # coarser tau sweep on val
        "on_device_eval": False,        # covering-box fast path (not the
                                        # contour protocol; diagnostics only)
        "crf_post_process": False,      # mean-field CRF refinement of eval
                                        # CAMs (reference DenseCRFFilter)
        "crf_pp_iters": 5,

        # ---------------------------------------------------------- model
        "task": constants.STD_CL,
        "arch": constants.STDCLASSIFIER,
        "encoder_name": constants.RESNET50,
        "encoder_weights": "imagenet",
        "in_channels": 3,
        "scale_in": 1.0,
        "freeze_cl": False,
        "folder_pre_trained_cl": "",
        "path_pre_trained": "",
        "strict": True,
        "support_background": False,
        "method": constants.METHOD_CAM,
        "spatial_pooling": constants.WGAP,
        "seg_mode": constants.BINARY_MODE,
        "multi_label_flag": False,
        "img_range": 1.0,
        "im_rec": False,
        "im_rec_lambda": 1.0,
        "im_rec_elb": False,

        # dtype policy: params fp32; training compute bf16 (the AMP
        # analogue, reference config.py:477), evaluation fp32 by default
        # (amp_eval=False, config.py:478 — bf16 reassociation can flip
        # single cv2 thresholds between compiles); set
        # eval_compute_dtype=bfloat16 for ~2x faster eval sweeps — the
        # evaluator rebuilds the model under this dtype when it differs
        # (engine/evaluator.py)
        "compute_dtype": "bfloat16",
        "eval_compute_dtype": "float32",
        # device->host CAM transfer for the eval protocol: float32
        # (exact) or uint16 ([0,1] packed into 2 bytes, quantization
        # error 7.6e-6 vs the protocol's .001 tau grid) — use uint16
        # when the host link, not the sweep, bounds evaluation
        "eval_transfer": "float32",
        # where the exact all-threshold protocol sweep runs: 'auto'
        # (device on TPU backends, host elsewhere), 'device' (force the
        # on-TPU sweep — metrics/device_sweep, bit-equal counters, only
        # (B,256,S) hit bits cross the link), 'host' (cv2/native sweep
        # on streamed-back CAMs).  Device sweep applies to the box
        # protocol with multi_contour_eval; other combinations fall
        # back to host automatically
        "eval_sweep": "auto",
        # eval dispatch pipeline depth: batches kept in flight on the
        # device before the first host-side sync.  On high-latency
        # links 1-deep overlap pays ~one round trip PER batch; N-deep
        # pays it once and then streams at max(device, host) rate
        "eval_pipeline_depth": 8,
        # keep prepared eval batches (pixels + GT) resident in HBM after
        # the first pass over a split: eval transforms are deterministic
        # and eval pipelines iterate unshuffled, so per-epoch
        # validations / repeated evals skip decode, packing AND the
        # host->device upload (the wall-clock bound on a tunneled link).
        # OPT-IN; bit-identical results.  Budget: ~crop^2*3 bytes/img
        # with h2d_transfer=uint8 (77 MB for 512 imgs @224px), 4x that
        # in float32 mode; over eval_device_cache_mb the recording is
        # abandoned and the run streams as before
        "eval_device_cache": False,
        "eval_device_cache_mb": 1024,
        # HBM-resident TRAIN data plane (data/device_feed.py): pixels at
        # resize resolution + stored CAMs live on the device; each step
        # uploads only pool rows / crop offsets / flips / labels, and
        # one jitted assembly crops/flips/fuses/ROIs on device.  OPT-IN
        # (0 = off); value = the frames-pool HBM budget in MiB
        # (~R^2*3 bytes/frame: YTOv1-scale 3200 frames @256px = 630 MB).
        # Over budget, or on multi-device meshes, the pipeline streams
        # as before.  Pixels match the uint8 posture bit-for-bit; the
        # CAM side fuses/resizes on device (same torch conventions,
        # ~1e-7 float differences vs the host matrix path)
        "train_device_cache_mb": 0,
        # K-step single-dispatch training over the HBM data plane
        # (engine/scan_train.py): the epoch's sampling plan uploads
        # once and one jitted program lax.scans K steps (assembly fused
        # with the train step), deleting the per-step host round trip
        # that bounds the sustained line on high-latency links.  Takes
        # effect only when the device feed is active
        # (train_device_cache_mb > 0); 0 = per-step dispatch.  Rolling
        # mid-epoch checkpoints land on chunk boundaries
        "train_dispatch_chunk": 8,
        # loss-side batch chunking (frames per group; 0 = off): lax.map
        # a rematerialized loss body over equal sample groups so the
        # backward holds one group's (chunk, P) buffers at a time —
        # extends the batch frontier past the bs256 memory wall
        # (PARITY round-4 item 7).  Must divide batch_size*clip_len.
        # Exact for every recipe loss (CE carries its true valid-count
        # denominator); float association differs ~1e-7
        "loss_chunk": 0,
        # host->device train-batch transfer: float32 ships normalized
        # image + raw separately; uint8 ships ONE uint8 pixel tensor
        # (the step re-derives the normalized input on device) plus
        # uint16 CAMs / uint8 roi+mask — ~5x less H2D traffic
        # (pipeline.compact_batch / steps.expand_compact_batch)
        "h2d_transfer": "float32",
        # epoch-persistent decoded-frame LRU cache budget (MiB) for the
        # native host pipeline: epochs >= 2 replay JPEG decode+resize
        # from RAM (data/native_loader.DecodedFrameCache).  OPT-IN
        # (0 = off): cached frames are uint8-rounded post-resize
        # (<= 0.5/255 per pixel — the same grid h2d_transfer=uint8 and
        # the reference's own PIL uint8 resize quantize to), so enabling
        # it changes default-float32 runs at the last bit; production
        # recipes pin 512 alongside h2d_transfer=uint8.  Size to the
        # touched-frame population (~192 KiB per 256px frame); eval
        # splits hit 100% once warm at any budget >= the split's size.
        "decode_cache_mb": 0,
        # rematerialize the model forward during backprop
        # (jax.checkpoint around the train-step apply): spends one extra
        # forward pass of FLOPs to avoid holding encoder/decoder
        # activations in HBM across the backward — the knob that unlocks
        # batch sizes XLA's memory planner otherwise rejects (bs256 at
        # 224px/M512 landmarks OOMs without it)
        "remat": False,

        # pooling-head hyperparameters
        "lse_r": 10.0,
        "wc_modalities": 5,
        "wc_kmax": 0.5,
        "wc_kmin": None,
        "wc_alpha": 0.6,
        "wc_dropout": 0.0,

        # ------------------------------------------------------ optimizer
        "opt_name": "sgd",
        "lr": 0.001,
        "momentum": 0.9,
        "dampening": 0.0,
        "weight_decay": 1e-4,
        "nesterov": True,
        "lr_scheduler": "mystep",
        "step_size": 5,
        "gamma": 0.1,
        "min_lr": 1e-7,
        "t_max": 50,                    # "cosine" (CosineAnnealingLR form)
        "lr_coef": 0.5,                 # "mycosine" coefficient (no
                                        # upstream default; 0.5 = the
                                        # reference demo value)
        "lr_milestones": [30, 60],      # "multistep" epochs
        "lr_classifier_ratio": 10.0,    # per-group LR on the cls head

        # ------------------------------------------------------------ ELB
        "elb_init_t": 1.0,
        "elb_max_t": 10.0,
        "elb_mulcoef": 1.01,

        # ----------------------------------------------------------- FCAM
        "sl_fc": False,
        "sl_fc_lambda": 1.0,
        "sl_start_ep": 0,
        "sl_end_ep": -1,
        "sl_min": 10,
        "sl_max": 10,
        "sl_block": 1,
        "sl_ksz": 1,
        "sl_min_p": 0.2,
        "sl_fg_erode_k": 11,
        "sl_fg_erode_iter": 1,
        # CRF filter implementation, shared by all CRF terms:
        # "exact" = dense O(P^2) Gaussian attention (Pallas/MXU);
        # "landmarks" = Nystrom over a uniform spatial landmark grid,
        # O(P*M) and near-exact on natural frames (relerr ~1e-4 at
        # M=1024 — the TPU fast path); "rff" = orthogonal random Fourier
        # features, content-independent, O(P*F)
        "crf_impl": "exact",
        "crf_n_landmarks": 1024,
        "crf_rff_freqs": 2048,
        "crf_fc": False,
        "crf_lambda": 2e-9,
        "crf_sigma_rgb": 15.0,
        "crf_sigma_xy": 100.0,
        "crf_scale": 1.0,
        "crf_start_ep": 0,
        "crf_end_ep": -1,
        "entropy_fc": False,
        "entropy_fc_lambda": 1.0,
        "max_sizepos_fc": False,
        "max_sizepos_fc_lambda": 1.0,
        "max_sizepos_fc_start_ep": 0,
        "max_sizepos_fc_end_ep": -1,

        # ----------------------------------------------------------- TCAM
        "tcam_pretrained_cl_ch_pt": constants.BEST_CL,
        "tcam_pretrained_seeder_ch_pt": constants.BEST_LOC,
        "knn_tc": 0,
        "sl_tc": False,
        "sl_tc_knn": 0,
        "sl_tc_knn_mode": constants.TIME_INSTANT,
        "sl_tc_knn_t": 0.0,
        "sl_tc_knn_epoch_switch_uniform": -1,
        "sl_tc_min_t": 0.0,
        "sl_tc_epoch_switch_to_sl": -1,
        "sl_tc_roi_method": constants.ROI_ALL,
        "sl_tc_roi_min_size": 0.05,
        "sl_tc_lambda": 1.0,
        "sl_tc_start_ep": 0,
        "sl_tc_end_ep": -1,
        "sl_tc_min": 10,
        "sl_tc_max": 10,
        "sl_tc_block": 1,
        "sl_tc_ksz": 1,
        "sl_tc_min_p": 0.2,
        "sl_tc_max_p": 0.2,
        "sl_tc_use_roi": False,
        "sl_tc_seed_tech": constants.SEED_UNIFORM,
        "sl_tc_fg_erode_k": 11,
        "sl_tc_fg_erode_iter": 0,
        "crf_tc": False,
        "crf_tc_lambda": 2e-9,
        "crf_tc_sigma_rgb": 15.0,
        "crf_tc_sigma_xy": 100.0,
        "crf_tc_scale": 1.0,
        "crf_tc_start_ep": 0,
        "crf_tc_end_ep": -1,
        "rgb_jcrf_tc": False,
        "rgb_jcrf_tc_lambda": 2e-9,
        "rgb_jcrf_tc_sigma_rgb": 15.0,
        "rgb_jcrf_tc_scale": 1.0,
        "rgb_jcrf_tc_start_ep": 0,
        "rgb_jcrf_tc_end_ep": -1,
        "max_sizepos_tc": False,
        "max_sizepos_tc_lambda": 1.0,
        "max_sizepos_tc_start_ep": 0,
        "max_sizepos_tc_end_ep": -1,
        "size_bg_g_fg_tc": False,
        "size_bg_g_fg_tc_lambda": 1.0,
        "size_bg_g_fg_tc_start_ep": 0,
        "size_bg_g_fg_tc_end_ep": -1,
        "empty_out_bb_tc": False,
        "empty_out_bb_tc_lambda": 1.0,
        "empty_out_bb_tc_start_ep": 0,
        "empty_out_bb_tc_end_ep": -1,
        "sizefg_tmp_tc": False,
        "sizefg_tmp_tc_knn": 0,
        "sizefg_tmp_tc_knn_mode": constants.TIME_INSTANT,
        "sizefg_tmp_tc_eps": 0.001,
        "sizefg_tmp_tc_lambda": 1.0,
        "sizefg_tmp_tc_start_ep": 0,
        "sizefg_tmp_tc_end_ep": -1,
        "seg_ignore_idx": constants.SEG_IGNORE_IDX,

        # ---------------------------------------------------------- C_BOX
        # flag names follow the reference C_BOX block 1:1
        # (/root/reference/dlib/configure/config.py:504-549) so recipes
        # translate unchanged.
        "cb_pretrained_cl_ch_pt": constants.BEST_CL,
        "cb_area_box": False,
        "cb_area_box_l": 1.0,
        "cb_area_normed": False,
        "cb_area_box_start_epoch": 0,
        "cb_area_box_end_epoch": -1,
        "cb_cl_score": False,
        "cb_cl_score_l": 1.0,
        "cb_cl_score_start_epoch": 0,
        "cb_cl_score_end_epoch": -1,
        "cb_cl_score_blur_ksize": 65,   # odd; blurred-bg composite kernel
        "cb_cl_score_blur_sigma": 60.0,
        "cb_pp_box": False,             # BoxBounds regression on the
                                        # sanitized previous prediction
        "cb_pp_box_l": 1.0,
        "cb_pp_box_start_epoch": 0,
        "cb_pp_box_end_epoch": -1,
        "cb_pp_box_alpha": 0.1,   # accepted for recipe parity; vestigial
                                  # upstream (flag + default only, no
                                  # consumer — verified by grep)
        "cb_pp_box_min_size_type": constants.SIZE_DATA,
        "cb_pp_box_min_size": 0.05,   # min box area fraction before the
                                      # pre-forward re-randomizes it
        "cb_seed": False,
        "cb_seed_l": 1.0,
        "cb_seed_start_epoch": 0,
        "cb_seed_end_epoch": -1,
        "cb_seed_erode_k": 11,
        "cb_seed_erode_iter": 1,
        "cb_seed_ksz": 3,
        "cb_seed_n": 1,
        "cb_seed_bg_low_z": 0.3,
        "cb_seed_bg_up_z": 0.4,
        "cb_seed_bg_z_type": constants.SIZE_DATA,  # accepted for recipe
        # parity; the reference never consumes it (grep: only the flag and
        # the default exist) — bg z always samples U[low_z, up_z]
        "cb_init_box_size": 0.95,   # fallback box size ~ N(size, var)
        "cb_init_box_var": 0.015,
        "cb_scale_domain": 1.0,
        "freeze_encoder": False,

        # --------------------------------------------------- parallelism
        # TPU-native: an explicit device mesh replaces DDP
        # (/root/reference/dlib/parallel/my_ddp.py). dp shards the batch;
        # mp is reserved for model-parallel annotations.
        "mesh_dp": -1,                  # -1: all visible devices
        "mesh_mp": 1,

        # ---------------------------------------------------------- misc
        "log_every": 10,
        "plot_tr_cam_progress": False,
        "plot_tr_cam_progress_n": 4,      # frames in the progress grid
        "alpha_visu": 100,    # CAM-overlay transparency, 0-255 image
                              # weight (reference config.py:161; vestigial
                              # upstream — no consumer — but wired to the
                              # overlay blend here)
        "demo_video": False,
    }
    return cfg


_BOOL_TRUE = {"1", "true", "yes", "y", "t"}


def _coerce(v_default: Any, s: str) -> Any:
    """Coerce CLI string to the default's type."""
    if isinstance(v_default, bool):
        return s.lower() in _BOOL_TRUE
    if isinstance(v_default, int) and not isinstance(v_default, bool):
        return int(s)
    if isinstance(v_default, float):
        return float(s)
    if isinstance(v_default, list):
        return yaml.safe_load(s)
    if v_default is None:
        try:
            return yaml.safe_load(s)
        except Exception:
            return s
    return s


# reference flag names (parseit.py:155-189) -> our keys, so the
# published commands (/root/reference/README.md:236-339) paste in
# unchanged
_REFERENCE_ALIASES = {
    "opt__name_optimizer": "opt_name",
    "opt__lr": "lr",
    "opt__momentum": "momentum",
    "opt__dampening": "dampening",
    "opt__nesterov": "nesterov",
    "opt__weight_decay": "weight_decay",
    "opt__name_lr_scheduler": "lr_scheduler",
    "opt__gamma": "gamma",
    "opt__min_lr": "min_lr",
    "opt__t_max": "t_max",
    "opt__step_size": "step_size",
    "opt__lr_classifier_ratio": "lr_classifier_ratio",
}

# torchrun/DDP/CUDA-era flags from the reference's commands, meaningless
# under jit on TPU (device selection and collectives are the runtime's
# job; precision is compute_dtype): accepted and dropped with a warning.
# The adam-only keys are included because opt_name=sgd is the only
# supported optimizer (every published recipe) and build_optimizer
# asserts it — a pasted adam run fails THERE with a clear message.
_REFERENCE_IGNORED = {
    "local_world_size", "local_rank", "dist_backend", "cudaid",
    "c_cudaid", "world_size", "amp", "amp_eval",
    "opt__beta1", "opt__beta2", "opt__eps_adam", "opt__amsgrad",
    "opt__last_epoch",
}


def _normalize_reference_argv(argv):
    """Rewrite reference-schema flags: aliases renamed, runtime flags
    dropped (warned), --opt__lr_scheduler False -> lr_scheduler=constant."""
    import warnings
    out, dropped, i = [], [], 0
    argv = list(argv)

    def _split(tok):
        name_val = tok[2:].split("=", 1)
        return name_val[0], (name_val[1] if len(name_val) == 2 else None)

    while i < len(argv):
        tok = argv[i]
        if not tok.startswith("--"):
            out.append(tok)
            i += 1
            continue
        name, inline_val = _split(tok)
        has_sep_val = (inline_val is None and i + 1 < len(argv)
                       and not argv[i + 1].startswith("--"))
        if name in _REFERENCE_IGNORED:
            dropped.append(name)
            i += 2 if has_sep_val else 1
            continue
        if name == "opt__lr_scheduler":
            val = inline_val if inline_val is not None else (
                argv[i + 1] if has_sep_val else "true")
            if val.lower() not in _BOOL_TRUE:
                out += ["--lr_scheduler", "constant"]
            i += 2 if has_sep_val else 1
            continue
        if name in _REFERENCE_ALIASES:
            new = _REFERENCE_ALIASES[name]
            out.append(f"--{new}={inline_val}" if inline_val is not None
                       else f"--{new}")
        else:
            out.append(tok)
        i += 1
    if dropped:
        warnings.warn(
            "reference runtime flags accepted and ignored (no-ops on "
            f"this backend): {sorted(set(dropped))}", stacklevel=3)
    return out


def parse_args(argv=None, defaults: Optional[Dict[str, Any]] = None) -> HParams:
    """CLI override layer: --dataset picks the default dict, every other key
    in it becomes a flag (reference get_args, parseit.py:82-938).
    Reference-schema spellings (--opt__*, torchrun/CUDA runtime flags)
    are normalized first so the published commands paste in unchanged."""
    import sys
    argv = _normalize_reference_argv(
        sys.argv[1:] if argv is None else argv)
    boot = argparse.ArgumentParser(add_help=False)
    boot.add_argument("--dataset", type=str, default=constants.YTOV1)
    boot.add_argument("--config", type=str, default="",
                      help="optional yaml file applied before CLI flags")
    ns, rest = boot.parse_known_args(argv)

    cfg = defaults or get_config(ns.dataset)
    cfg["dataset"] = ns.dataset
    if ns.config:
        with open(ns.config) as f:
            file_cfg = yaml.safe_load(f) or {}
        for k, v in file_cfg.items():
            cfg[k] = v

    parser = argparse.ArgumentParser(
        description="TPU-native TCAM WSOL-video framework")
    for k, v in sorted(cfg.items()):
        if k == "dataset":
            continue
        parser.add_argument(f"--{k}", type=str, default=None)
    ns2 = parser.parse_args(rest)
    for k, v in vars(ns2).items():
        if v is not None:
            cfg[k] = _coerce(cfg[k], v)

    return finalize(HParams(cfg))


def experiment_tag(args: HParams, checkpoint_type: Optional[str] = None) -> str:
    """Canonical experiment/pretrained folder tag (reference get_tag,
    /root/reference/dlib/utils/tools.py:256-268)."""
    chpt = checkpoint_type or args.eval_checkpoint_type
    return (f"{args.dataset}-{args.encoder_name}-{args.method}-"
            f"{args.spatial_pooling}-cp_{chpt}-boxv2_{args.box_v2_metric}")


def config_digest(args: HParams) -> str:
    blob = yaml.safe_dump(args.to_dict(), sort_keys=True).encode()
    return hashlib.sha1(blob).hexdigest()[:10]


def finalize(args: HParams) -> HParams:
    """Resolve derived fields + cross-flag sanity checks
    (reference parseit.py:639-937)."""
    assert args.task in constants.TASKS, args.task
    assert args.dataset in constants.DATASETS
    assert args.spatial_pooling in constants.SPATIAL_POOLINGS
    assert args.method in constants.CAM_METHODS
    assert args.sl_tc_seed_tech in constants.SEED_TECHS
    assert args.crf_impl in ("exact", "landmarks", "rff"), args.crf_impl
    assert args.eval_transfer in ("float32", "uint16",
                                  "uint8"), args.eval_transfer
    # uint8 readback equals the box protocol's own (scoremap*255)
    # truncation bit-exactly, but PxAP consumes the float CAM — keep
    # the 1-byte transfer off mask datasets (engine/steps.py)
    assert not (args.eval_transfer == "uint8"
                and args.dataset == constants.OpenImages), \
        "eval_transfer=uint8 is box-protocol only (PxAP needs float CAMs)"
    assert args.h2d_transfer in ("float32", "uint8"), args.h2d_transfer
    assert args.eval_sweep in ("auto", "device", "host"), args.eval_sweep
    assert args.sl_tc_roi_method in constants.ROI_SELECT
    assert args.sl_tc_knn_mode in constants.TIME_DEPENDENCY

    if args.task == constants.STD_CL:
        assert args.arch == constants.STDCLASSIFIER
    if args.task == constants.TCAM:
        assert args.arch == constants.UNETTCAM
        assert args.dataset in constants.VIDEO_DATASETS
    if args.task == constants.F_CL:
        assert args.arch == constants.UNETFCAM
    if args.task == constants.C_BOX:
        assert args.arch == constants.DENSEBOXNET
        assert args.cb_pp_box_min_size_type in constants.SIZE_TYPES
        assert args.cb_seed_bg_z_type in constants.SIZE_TYPES
        assert args.cb_pretrained_cl_ch_pt in constants.CHECKPOINT_TYPES
        assert args.cb_cl_score_blur_ksize % 2 == 1, "blur ksize must be odd"
        assert 0.0 <= args.cb_seed_bg_low_z <= args.cb_seed_bg_up_z <= 1.0
        assert 0.0 < args.cb_init_box_size <= 1.0
        assert args.cb_init_box_var >= 0.0
        assert args.cb_seed_n >= 1

    # pooling must match the CAM method (reference METHOD_2_POOLINGHEAD)
    want_pool = constants.METHOD_2_POOLINGHEAD[args.method]
    if args.task == constants.STD_CL:
        assert args.spatial_pooling == want_pool, (
            f"method {args.method} requires pooling {want_pool}")

    # TCAM clip sampling divides the effective per-step new-frame budget:
    # batch of B shots expands to B*(2k+1) frames (reference
    # parseit.py:641-645)
    if args.task == constants.TCAM and args.knn_tc > 0:
        args.batch_size = max(1, args.batch_size // (2 * args.knn_tc + 1))

    if args.sl_tc_knn_mode == constants.TIME_INSTANT:
        assert args.sl_tc_knn == 0

    # sl_block/sl_tc_block are parsed for recipe compatibility but pinned
    # at 1: the reference also never consumes them (documented intent at
    # /root/reference/dlib/configure/config.py:313-315, zero call sites in
    # dlib/cams/*_seeding.py — seeds are always per-pixel)
    assert args.sl_block == 1 and args.sl_tc_block == 1, (
        "block seeding is a no-op upstream; only block=1 is supported")

    if args.ds_chunkable:
        from tcam_wsol_video_tpu.data.ilsvrc_buckets import num_buckets
        args.nbr_buckets = num_buckets(args.nbr_chunks, args.bucket_sz)
    else:
        args.nbr_buckets = 1

    args.std_cl_method_requires_grad = constants.METHOD_REQU_GRAD[args.method]
    args.tag = experiment_tag(args)
    args.digest = config_digest(args)
    return args


def dump_config(args: HParams, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(args.to_dict(), f, sort_keys=True)
