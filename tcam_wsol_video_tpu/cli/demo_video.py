"""Build demo videos: per-frame CAM overlays + predicted/GT boxes -> mp4.

Parity target: the reference's demo-video path over the test-video-demo
split (/root/reference/dlib/learning/inference_wsol.py:1041-1065 +
dlib/visualization/videos.py:33-118).

Usage:
    python -m tcam_wsol_video_tpu.cli.demo_video --exp_dir <exp> \
        --split test-video-demo --out demos/ --dataset ... --task TCAM \
        --arch UnetTCAM [--tau 0.5] [--max_videos 4]
"""
from __future__ import annotations

import argparse
import collections
import os

import jax
import jax.numpy as jnp
import numpy as np

from tcam_wsol_video_tpu.core import checkpoint as ckpt
from tcam_wsol_video_tpu.core.hparams import parse_args
from tcam_wsol_video_tpu.core.logger import init_logger, log
from tcam_wsol_video_tpu.core.prng import KeyChain
from tcam_wsol_video_tpu.data.dataset import WSOLVideoDataset
from tcam_wsol_video_tpu.data.folds import load_split_metadata
from tcam_wsol_video_tpu.data.pipeline import DataPipeline
from tcam_wsol_video_tpu.data.transforms import PairedTransform
from tcam_wsol_video_tpu.engine.steps import make_cam_eval_step
from tcam_wsol_video_tpu.metrics.wsol import scoremap_to_boxes
from tcam_wsol_video_tpu.models.factory import (create_model_from_args,
                                                init_model)
from tcam_wsol_video_tpu.viz import wsol_viz


def main(argv=None):
    boot = argparse.ArgumentParser(add_help=False)
    boot.add_argument("--exp_dir", type=str, required=True)
    boot.add_argument("--out", type=str, required=True)
    boot.add_argument("--split", type=str, default="test-video-demo")
    boot.add_argument("--tau", type=float, default=0.5)
    boot.add_argument("--max_videos", type=int, default=4)
    boot.add_argument("--fps", type=int, default=8)
    boot.add_argument("--reuse_threshold", type=float, default=0.0,
                      help="change-based inference: skip the model for "
                           "frames whose mean |delta| vs the last "
                           "computed frame of the video is below this "
                           "(pixel units in [0,255]; 0 = off)")
    ns, rest = boot.parse_known_args(argv)
    args = parse_args(rest)
    init_logger(ns.exp_dir, is_master=True)

    chpt_dir = os.path.join(ns.exp_dir, args.eval_checkpoint_type)
    step, payload = ckpt.load_best_model(chpt_dir)
    assert payload is not None, f"no best model under {chpt_dir}"

    kc = KeyChain(args.seed)
    data_root = os.path.join(args.data_root, args.dataset)
    md = load_split_metadata(args.metadata_root, ns.split)
    ds = WSOLVideoDataset(
        md, data_root, ns.split, args.dataset,
        PairedTransform(args.resize_size, args.crop_size, train=False),
        kc, crop_size=args.crop_size)
    pipe = DataPipeline(ds, args.eval_batch_size, kc, shuffle=False,
                        num_workers=args.num_workers,
                        # single-pass CLI: zero cache hits by construction
                        decode_cache_mb=0)

    model = create_model_from_args(args)
    c = args.crop_size
    variables = jax.device_get(init_model(model, kc.key("init"),
                                          (1, c, c, 3)))
    variables = ckpt.merge_components_into_variables(
        variables, payload["components"])
    eval_step = make_cam_eval_step(model, args)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    # group frames by video (class/data/<video>)
    from tcam_wsol_video_tpu.engine.temporal_reuse import FrameReusePlanner
    planner = FrameReusePlanner(ns.reuse_threshold)
    frames_by_video = collections.defaultdict(list)
    key = kc.key("demo")
    for batch in pipe.epoch(0):
        vids = ["/".join(iid.split("/")[:3])
                for iid in batch["image_id"]]
        compute_rows, reuse_from = planner.plan(vids, batch["raw_img"])
        n = len(vids)
        cams_np = np.zeros((n,) + np.asarray(batch["raw_img"]).shape[1:3],
                           np.float32)
        sub = None
        if compute_rows:
            # compact changed frames, pad back to the compiled batch
            # shape so the jitted step never re-traces
            imgs = np.asarray(batch["image"])
            sel = np.zeros_like(imgs)
            sel[:len(compute_rows)] = imgs[compute_rows]
            labels = np.zeros_like(np.asarray(batch["label"]))
            labels[:len(compute_rows)] = np.asarray(
                batch["label"])[compute_rows]
            cams, _ = eval_step(params, bstats, jnp.asarray(sel),
                                jnp.asarray(labels), key)
            from tcam_wsol_video_tpu.engine.steps import \
                dequantize_cams_np
            sub = dequantize_cams_np(np.asarray(cams))
        planner.resolve_rows(vids, compute_rows, reuse_from, sub, cams_np)
        for i, iid in enumerate(batch["image_id"]):
            if not batch["valid"][i]:
                continue
            vid = vids[i]
            if (len(frames_by_video) >= ns.max_videos
                    and vid not in frames_by_video):
                continue
            pred_boxes, _ = scoremap_to_boxes(
                cams_np[i], [ns.tau], multi_contour=False)
            gt = ds.eval_gt_boxes(iid)
            frame = wsol_viz.cam_overlay(batch["raw_img"][i], cams_np[i],
                                         alpha=args.alpha_visu / 255.0)
            frame = wsol_viz.draw_boxes(frame, gt, wsol_viz.GT_COLOR)
            frame = wsol_viz.draw_boxes(frame, pred_boxes[0],
                                        wsol_viz.PRED_COLOR)
            frames_by_video[vid].append((iid, frame))

    if ns.reuse_threshold > 0.0:
        log(f"change-based inference: {planner.n_computed} computed, "
            f"{planner.n_reused} reused "
            f"({100.0 * planner.reuse_fraction:.1f}% model calls saved)")

    os.makedirs(ns.out, exist_ok=True)
    written = []
    for vid, frames in frames_by_video.items():
        frames.sort(key=lambda t: t[0])
        path = os.path.join(ns.out, vid.replace("/", "_") + ".mp4")
        wsol_viz.build_demo_video([f for _, f in frames], path, fps=ns.fps)
        written.append(path)
        log(f"wrote {path} ({len(frames)} frames)")
    return written


if __name__ == "__main__":
    main()
