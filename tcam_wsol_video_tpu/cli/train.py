"""Training entry point.

Parity target: /root/reference/main.py:33-167 — parse flags, build
model/optimizer/losses, restore checkpoints, load the frozen pretrained
classifier for TCAM/F_CL, loop epochs with validation + model selection,
final test evaluation at best-loc and best-cl checkpoints.

Usage:
    python main.py --dataset YouTube-Objects-v1.0 --task STD_CL ...
    python main.py --task TCAM --arch UnetTCAM --sl_tc true \
        --folder_pre_trained_cl <stage1-exp-dir> ...
"""
from __future__ import annotations

import os
from typing import Dict

import jax

from tcam_wsol_video_tpu.core import constants
from tcam_wsol_video_tpu.core import checkpoint as ckpt
from tcam_wsol_video_tpu.core.hparams import HParams, dump_config, parse_args
from tcam_wsol_video_tpu.core.logger import init_logger, log
from tcam_wsol_video_tpu.core.prng import KeyChain
from tcam_wsol_video_tpu.data.cam_store import CamStore
from tcam_wsol_video_tpu.data.dataset import WSOLVideoDataset
from tcam_wsol_video_tpu.data.folds import load_split_metadata
from tcam_wsol_video_tpu.data.pipeline import DataPipeline
from tcam_wsol_video_tpu.data.transforms import PairedTransform
from tcam_wsol_video_tpu.engine.trainer import Trainer
from tcam_wsol_video_tpu.models.factory import create_model_from_args
from tcam_wsol_video_tpu.parallel import mesh as pmesh


def _snapshot_code(outd: str) -> None:
    """Archive the framework source into the experiment dir so every run
    is reproducible from its own folder (reference copy_code,
    parseit.py:1200-1215)."""
    import tarfile
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        with tarfile.open(os.path.join(outd, "code.tar.gz"), "w:gz") as tar:
            tar.add(pkg_dir, arcname="tcam_wsol_video_tpu",
                    filter=lambda ti: None if "__pycache__" in ti.name
                    else ti)
    except Exception:
        pass  # snapshotting must never block training


def build_data(args: HParams, kc: KeyChain):
    meta_root = args.metadata_root
    data_root = os.path.join(args.data_root, args.dataset)
    if not os.path.isdir(meta_root):
        cand = os.path.join(args.data_root, meta_root, args.dataset)
        if os.path.isdir(cand):
            meta_root = cand
    args.metadata_root = meta_root  # resolved path (bucket loop reads it)
    cam_store = CamStore(args.std_cams_folder) if args.std_cams_folder \
        else None

    # proxy_training_set trains on the reduced image_ids_proxy.txt subset
    # (reference get_data_loader, wsol_loader.py:995)
    train_md = load_split_metadata(meta_root, constants.TRAINSET,
                                   proxy=args.proxy_training_set)
    train_ds = WSOLVideoDataset(
        train_md, data_root, constants.TRAINSET, args.dataset,
        PairedTransform(args.resize_size, args.crop_size, train=True),
        kc, crop_size=args.crop_size, cam_store=cam_store,
        knn_tc=args.knn_tc, sl_tc_knn=args.sl_tc_knn,
        sl_tc_knn_mode=args.sl_tc_knn_mode, use_roi=args.sl_tc_use_roi,
        roi_method=args.sl_tc_roi_method,
        p_min_area_roi=args.sl_tc_roi_min_size)
    train_pipe = DataPipeline(train_ds, args.batch_size, kc, shuffle=True,
                              num_workers=args.num_workers,
                              num_shards=jax.process_count(),
                              shard_index=jax.process_index(),
                              compact=(args.h2d_transfer == "uint8"),
                              decode_cache_mb=getattr(
                                  args, "decode_cache_mb", 0),
                              train_device_cache_mb=(
                                  getattr(args, "train_device_cache_mb", 0)
                                  if jax.process_count() == 1
                                  else 0))

    eval_pipes = {}
    for split in (constants.VALIDSET, constants.TESTSET):
        md = load_split_metadata(meta_root, split)
        if split == constants.VALIDSET and args.num_val_sample_per_class:
            # mini-val: n random ids per class (reference
            # num_val_sample_per_class, wsol_loader.py:999 + :424-445)
            from tcam_wsol_video_tpu.data.folds import subsample_per_class
            md = subsample_per_class(md, args.num_val_sample_per_class,
                                     kc.numpy_rng("val_subsample"))
        ds = WSOLVideoDataset(
            md, data_root, split, args.dataset,
            PairedTransform(args.resize_size, args.crop_size, train=False),
            kc, crop_size=args.crop_size)
        # eval splits shard per process too (reference attaches a
        # DistributedSampler to all 3 splits, wsol_loader.py:1008-1012);
        # the evaluator then psums counters across processes
        pipe = DataPipeline(ds, args.eval_batch_size, kc, shuffle=False,
                            num_workers=args.num_workers,
                            num_shards=jax.process_count(),
                            shard_index=jax.process_index(),
                            compact=(args.h2d_transfer == "uint8"),
                            decode_cache_mb=getattr(args, "decode_cache_mb", 0))
        eval_pipes[split] = (ds, pipe)
    return train_pipe, eval_pipes


def load_pretrained_classifier_weights(args: HParams, variables: dict
                                       ) -> dict:
    """Initialize encoder (+cls head) from the stage-1 best checkpoint
    (reference instantiators.py:575-640: folder_pre_trained_cl)."""
    folder = args.folder_pre_trained_cl
    if not folder:
        return variables
    chpt_dir = os.path.join(folder, args.tcam_pretrained_cl_ch_pt)
    if not os.path.isdir(chpt_dir):
        chpt_dir = folder
    step, payload = ckpt.load_best_model(chpt_dir)
    assert payload is not None, f"no best model under {chpt_dir}"
    comps = payload["components"]
    # intersect with the TARGET model's components: C_BOX's DenseBoxNet
    # has no classification_head, and the reference's loader likewise
    # only moves the encoder onto it (instantiators.py:588-617 loads
    # encoder+head for F_CL/TCAM, encoder alone for the boxnet)
    present = set(variables.get("params", {}).keys())
    only = [c for c in ("encoder", "classification_head")
            if c in comps and c in present]
    log(f"loading pretrained classifier from {chpt_dir} (step {step}): "
        f"{only}")
    return ckpt.merge_components_into_variables(variables, comps, only=only)


def main(argv=None) -> Dict:
    from tcam_wsol_video_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    args = parse_args(argv)
    pmesh.maybe_init_distributed()
    is_master = jax.process_index() == 0
    outd = os.path.join(args.outd, args.tag, args.exp_id)
    os.makedirs(outd, exist_ok=True)
    init_logger(outd, is_master=is_master)
    if is_master:  # config/code snapshots: one writer per experiment dir
        dump_config(args, os.path.join(outd, "config.yml"))
        _snapshot_code(outd)
    log(f"experiment {args.tag} digest {args.digest}")

    kc = KeyChain(args.seed)
    train_pipe, eval_pipes = build_data(args, kc)

    model = create_model_from_args(args)
    c = args.crop_size
    from tcam_wsol_video_tpu.models.factory import init_model
    variables = jax.device_get(init_model(model, kc.key("init"),
                                          (1, c, c, 3)))
    variables = load_pretrained_classifier_weights(args, variables)

    # TCAM/F_CL/C_BOX train against a frozen stage-1 classifier: C_BOX for
    # scoring, TCAM/F_CL as the on-the-fly seed source when no CAM store
    # is given (reference main.py:61-70 get_pretrainde_classifier; seeder
    # weights come from the BEST_LOC checkpoint, config.py:363-368)
    classifier = None
    if args.task in (constants.C_BOX, constants.TCAM, constants.F_CL):
        from tcam_wsol_video_tpu.models.factory import init_model as _im
        cls_model = create_model_from_args(
            args, override_arch_for_classifier=True)
        cls_vars = jax.device_get(_im(cls_model, kc.key("cls"),
                                      (1, c, c, 3)))
        if args.folder_pre_trained_cl:
            chpt = os.path.join(args.folder_pre_trained_cl,
                                args.tcam_pretrained_seeder_ch_pt)
            step, payload = ckpt.load_best_model(
                chpt if os.path.isdir(chpt) else args.folder_pre_trained_cl)
            assert payload is not None
            cls_vars = ckpt.merge_components_into_variables(
                cls_vars, payload["components"],
                only=["encoder", "classification_head"])
        classifier = (cls_model, cls_vars)

    trainer = Trainer(args, model, train_pipe, eval_pipes, keychain=kc,
                      init_variables=variables, classifier=classifier)

    # ILSVRC bucket staging from the CLI (reference wires it inside the
    # trainer at train_wsol.py:1081-1103; here it is shell templates with
    # {bucket} substituted, run around each bucket by the Trainer loop)
    if args.ds_chunkable and (args.bucket_stage_cmd
                              or args.bucket_cleanup_cmd):
        from tcam_wsol_video_tpu.data.ilsvrc_buckets import BucketStager

        def _cmd(tmpl):
            if not tmpl:
                return None
            return lambda b: ["bash", "-c", tmpl.format(bucket=b)]

        trainer.bucket_stager = BucketStager(
            stage_cmd=_cmd(args.bucket_stage_cmd),
            cleanup_cmd=_cmd(args.bucket_cleanup_cmd))
        log(f"bucket stager attached: stage={args.bucket_stage_cmd!r} "
            f"cleanup={args.bucket_cleanup_cmd!r}")

    results = trainer.fit()
    log({"final": {k: {m: v for m, v in r.items()
                       if isinstance(v, (int, float))}
                   for k, r in results.items()}})
    # experiment-done sentinel (reference `passed.txt`, parseit.py:669-680)
    if jax.process_index() == 0:
        with open(os.path.join(outd, "passed.txt"), "w") as f:
            f.write("done\n")
    return results


if __name__ == "__main__":
    main()
