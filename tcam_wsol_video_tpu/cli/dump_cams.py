"""Dump per-frame stage-1 classifier CAMs + Otsu ROI thresholds.

Parity target: CAMComputer._build_store_std_cam_low
(/root/reference/dlib/learning/inference_wsol.py:1073-1132) — which has no
call site in the reference (the stage-1 -> TCAM handoff is manual,
README.md:267-271).  Here it is a first-class CLI: run the trained STD_CL
classifier over every frame of the train split and write low-resolution
CAMs (.npy) plus a roi_thresholds.txt into a CamStore consumed by TCAM
training (--std_cams_folder).

Usage:
    python -m tcam_wsol_video_tpu.cli.dump_cams --dataset ... \
        --task STD_CL --exp_dir exps/<tag>/<id> --out data_cams/<tag>
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from tcam_wsol_video_tpu.core import checkpoint as ckpt
from tcam_wsol_video_tpu.core import constants
from tcam_wsol_video_tpu.core.hparams import parse_args
from tcam_wsol_video_tpu.core.logger import init_logger, log
from tcam_wsol_video_tpu.core.prng import KeyChain
from tcam_wsol_video_tpu.data.cam_store import CamStore
from tcam_wsol_video_tpu.data.dataset import WSOLVideoDataset
from tcam_wsol_video_tpu.data.folds import load_split_metadata
from tcam_wsol_video_tpu.data.transforms import PairedTransform
from tcam_wsol_video_tpu.engine.steps import make_classifier_cam_fn
from tcam_wsol_video_tpu.metrics.otsu_np import otsu_np
from tcam_wsol_video_tpu.models.factory import (create_model_from_args,
                                                init_model)


def dump_threshold_np(cam_lo: np.ndarray, crop_size: int) -> float:
    """Stored ROI threshold for one low-res CAM, in [0, 1].

    Reference rule (inference_wsol.py:1112-1125): STOtsu over
    floor(255 * interpolate(cam, (crop, crop), bilinear,
    align_corners=TRUE)) — the threshold is computed on the CROP-SIZE
    upsample (whose interpolated in-between values reshape the histogram),
    not on the stored low-res map, then divided by 255 for the file."""
    from tcam_wsol_video_tpu.ops.interpolate import _linear_matrix
    mh = np.asarray(_linear_matrix(cam_lo.shape[0], crop_size, True))
    mw = np.asarray(_linear_matrix(cam_lo.shape[1], crop_size, True))
    full = mh @ np.asarray(cam_lo, np.float64) @ mw.T
    return otsu_np(np.floor(full * 255.0)) / 255.0


def dump_cams(args, exp_dir: str, out_dir: str, cam_size: int = 28,
              batch_size: int = 32) -> CamStore:
    kc = KeyChain(args.seed)
    meta_root = args.metadata_root
    data_root = os.path.join(args.data_root, args.dataset)
    md = load_split_metadata(meta_root, constants.TRAINSET)
    ds = WSOLVideoDataset(
        md, data_root, constants.TRAINSET, args.dataset,
        PairedTransform(args.resize_size, args.crop_size, train=False),
        kc, crop_size=args.crop_size)

    model = create_model_from_args(args, task=constants.STD_CL,
                                   override_arch_for_classifier=True)
    variables = jax.device_get(init_model(model, kc.key("init"),
                                          (1, args.crop_size,
                                           args.crop_size, 3)))
    chpt_dir = os.path.join(exp_dir, args.eval_checkpoint_type)
    step, payload = ckpt.load_best_model(chpt_dir)
    assert payload is not None, f"no best model under {chpt_dir}"
    variables = ckpt.merge_components_into_variables(
        variables, payload["components"])
    log(f"dumping train CAMs from {chpt_dir} (step {step}) -> {out_dir}")

    cam_fn = make_classifier_cam_fn(model, args)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    # honor the production H2D posture (PARITY.md round-3): ship ONE
    # uint8 pixel tensor per batch and normalize on device — 4x less
    # upload on bandwidth-starved host links, where the f32 upload was
    # the measured bottleneck of the store dump (not decode or compute)
    use_u8 = str(getattr(args, "h2d_transfer", "float32")) == "uint8"

    from tcam_wsol_video_tpu.core.constants import (IMAGENET_MEAN,
                                                    IMAGENET_STD)
    from tcam_wsol_video_tpu.ops.interpolate import resize_hw

    @jax.jit
    def dump_step(params, bstats, images, targets):
        if images.dtype == jnp.uint8:
            mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
            std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
            images = (images.astype(jnp.float32) - mean) / std
        cams = cam_fn(params, bstats, images, targets)
        # store at low resolution (the reference stores encoder-resolution
        # maps and lets the dataset resize, wsol_loader.py:505-516);
        # resizing ON DEVICE keeps the readback at cam_size^2, not crop^2
        return jnp.clip(resize_hw(cams, (cam_size, cam_size)), 0.0, 1.0)

    store = CamStore(out_dir)
    thresholds = {}

    # enumerate every frame of every shot (train ids are shots)
    all_frames = []
    for sid in md.image_ids:
        frames = ds.index_of_frames.get(sid, [sid])
        all_frames.extend((f, md.labels[sid]) for f in frames)

    from PIL import Image
    from tcam_wsol_video_tpu.data.transforms import normalize_imagenet

    def _decode(chunk):
        imgs, labels = [], []
        for fid, lab in chunk:
            img = Image.open(os.path.join(data_root, fid)).convert("RGB")
            img = img.resize((args.crop_size, args.crop_size),
                             Image.BILINEAR)
            if use_u8:
                imgs.append(np.asarray(img, np.uint8))
            else:
                arr = np.asarray(img, np.float32) / 255.0
                imgs.append(normalize_imagenet(arr))
            labels.append(lab)
        if len(chunk) < batch_size:  # static shapes: tile-pad the tail
            imgs += [imgs[-1]] * (batch_size - len(chunk))
            labels += [labels[-1]] * (batch_size - len(chunk))
        return np.stack(imgs), np.asarray(labels, np.int32)

    def _process(pend):
        cams_dev, chunk = pend
        cams_lo = np.asarray(cams_dev)
        for j, (fid, _) in enumerate(chunk):
            store.save_cam(fid, cams_lo[j])
            thresholds[fid] = dump_threshold_np(cams_lo[j], args.crop_size)

    # one-batch software pipeline (same shape as CamEvaluator.run):
    # dispatch batch i, start its async host copy, decode + dispatch
    # batch i+1 while i computes/transfers, THEN store/Otsu batch i
    pending = None
    for i in range(0, len(all_frames), batch_size):
        chunk = all_frames[i:i + batch_size]
        imgs, labels = _decode(chunk)
        cams = dump_step(params, bstats, jnp.asarray(imgs),
                         jnp.asarray(labels))
        if hasattr(cams, "copy_to_host_async"):
            cams.copy_to_host_async()
        if pending is not None:
            _process(pending)
        pending = (cams, chunk)
    if pending is not None:
        _process(pending)

    store.save_thresholds(thresholds)
    log(f"wrote {len(thresholds)} cams")
    return store


def main(argv=None):
    boot = argparse.ArgumentParser(add_help=False)
    boot.add_argument("--exp_dir", type=str, required=True)
    boot.add_argument("--out", type=str, required=True)
    boot.add_argument("--cam_size", type=int, default=28)
    ns, rest = boot.parse_known_args(argv)
    args = parse_args(rest)
    init_logger(ns.exp_dir, is_master=True)
    return dump_cams(args, ns.exp_dir, ns.out, cam_size=ns.cam_size)


if __name__ == "__main__":
    main()
