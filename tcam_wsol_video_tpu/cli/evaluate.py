"""Standalone evaluation entry point — working, unlike the reference's.

The reference ships eval.py but it is broken (imports a non-existent
`get_evaluer`, and parse_input(eval=True) raises NotImplementedError —
/root/reference/eval.py:17,42, /root/reference/dlib/process/
parseit.py:1217-1219).  This is the capability it intended: point at an
experiment directory, pick a checkpoint criterion, evaluate any split.

Usage:
    python -m tcam_wsol_video_tpu.cli.evaluate --dataset ... --task TCAM \
        --arch UnetTCAM --exp_dir exps/<tag>/<exp_id> \
        --eval_checkpoint_type best_localization --split test
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict

import jax

from tcam_wsol_video_tpu.core import constants
from tcam_wsol_video_tpu.core import checkpoint as ckpt
from tcam_wsol_video_tpu.core.hparams import parse_args
from tcam_wsol_video_tpu.core.logger import init_logger, log
from tcam_wsol_video_tpu.core.prng import KeyChain
from tcam_wsol_video_tpu.data.dataset import WSOLVideoDataset
from tcam_wsol_video_tpu.data.folds import load_split_metadata
from tcam_wsol_video_tpu.data.pipeline import DataPipeline
from tcam_wsol_video_tpu.data.transforms import PairedTransform
from tcam_wsol_video_tpu.engine.evaluator import CamEvaluator
from tcam_wsol_video_tpu.models.factory import create_model_from_args


def main(argv=None) -> Dict[str, float]:
    from tcam_wsol_video_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    boot = argparse.ArgumentParser(add_help=False)
    boot.add_argument("--exp_dir", type=str, required=True)
    boot.add_argument("--split", type=str, default=constants.TESTSET)
    ns, rest = boot.parse_known_args(argv)

    args = parse_args(rest)
    init_logger(ns.exp_dir, is_master=True)

    kc = KeyChain(args.seed)
    meta_root = args.metadata_root
    data_root = os.path.join(args.data_root, args.dataset)
    md = load_split_metadata(meta_root, ns.split)
    ds = WSOLVideoDataset(
        md, data_root, ns.split, args.dataset,
        PairedTransform(args.resize_size, args.crop_size, train=False),
        kc, crop_size=args.crop_size)
    pipe = DataPipeline(ds, args.eval_batch_size, kc, shuffle=False,
                        num_workers=args.num_workers,
                        num_shards=jax.process_count(),
                        shard_index=jax.process_index(),
                        # single-pass CLI: every frame is decoded exactly
                        # once, so the epoch-persistent cache would cost
                        # RAM for zero hits — keep it off regardless of
                        # the (training-oriented) knob
                        decode_cache_mb=0)

    # resolve the checkpoint BEFORE the (slow) model init so a wrong
    # --exp_dir fails in milliseconds, not after a full XLA compile
    chpt_dir = os.path.join(ns.exp_dir, args.eval_checkpoint_type)
    step, payload = ckpt.load_best_model(chpt_dir)
    assert payload is not None, f"no best model under {chpt_dir}"

    model = create_model_from_args(args)
    c = args.crop_size
    from tcam_wsol_video_tpu.models.factory import init_model
    variables = jax.device_get(init_model(model, kc.key("init"),
                                          (1, c, c, 3)))
    variables = ckpt.merge_components_into_variables(
        variables, payload["components"])
    log(f"evaluating {args.eval_checkpoint_type} (step {step}) "
        f"on {ns.split}")

    classifier = None
    if args.task == constants.C_BOX:
        from tcam_wsol_video_tpu.models.factory import init_model as _im
        cls_model = create_model_from_args(
            args, override_arch_for_classifier=True)
        cls_vars = jax.device_get(_im(cls_model, kc.key("cls"),
                                      (1, c, c, 3)))
        if args.folder_pre_trained_cl:
            _, pl2 = ckpt.load_best_model(os.path.join(
                args.folder_pre_trained_cl,
                args.tcam_pretrained_seeder_ch_pt))
            if pl2 is not None:
                cls_vars = ckpt.merge_components_into_variables(
                    cls_vars, pl2["components"],
                    only=["encoder", "classification_head"])
        classifier = (cls_model, cls_vars)

    # multi-device eval: shard the batch over a dp mesh when the eval
    # batch divides evenly (single chip = 1x1 mesh, same code path)
    from tcam_wsol_video_tpu.parallel import mesh as pmesh
    pmesh.maybe_init_distributed()
    n_fit = jax.device_count() // args.mesh_mp
    dp = args.mesh_dp if args.mesh_dp != -1 else n_fit
    while dp > 1 and args.eval_batch_size % dp:
        dp -= 1
    mesh = pmesh.make_mesh(dp=dp, mp=args.mesh_mp,
                           devices=jax.devices()[:dp * args.mesh_mp])
    ev = CamEvaluator(model, args, ds, pipe, ns.split,
                      fast=False, on_device=args.on_device_eval,
                      classifier=classifier,
                      sharding=pmesh.batch_sharding(mesh))
    res = ev.run(variables, kc.key("eval", ns.split),
                 reduce_fn=(lambda x: pmesh.psum_across(x, mesh))
                 if jax.process_count() > 1 else None)
    res.pop("curves", None)
    printable = {k: v for k, v in res.items()
                 if isinstance(v, (int, float, list))}
    log(printable)
    print(json.dumps(printable))
    return res


if __name__ == "__main__":
    main()
