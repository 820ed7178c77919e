"""Jitted train / eval step builders.

Parity target: the reference's hot loops —
Trainer._wsol_training + TCAM branch
(/root/reference/dlib/learning/train_wsol.py:700-890, 1107-1184) and
CAMComputer.get_cam_one_sample (inference_wsol.py:248-374).

TPU-native shape: ONE jitted function per phase.  The train step fuses
forward, seed sampling, every loss term (CRF included — no GPU->CPU->C++
round trip like dense_crf_loss.py:55-60), backward and the optimizer
update; batches arrive clip-major with static shapes.  The eval step
batch-computes CAMs where the reference pushes batch-size-1 tensors
through the model (inference_wsol.py:332-337).  Data parallelism is a
sharding annotation on the batch: XLA inserts the gradient psum (the DDP
all-reduce analogue).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tcam_wsol_video_tpu.cams import extractors as ex
from tcam_wsol_video_tpu.cams.seeding import TCAMSeederCfg, tcam_seeder
from tcam_wsol_video_tpu.core import constants
from tcam_wsol_video_tpu.engine.state import TrainState
from tcam_wsol_video_tpu.losses.core import LossInputs, MasterLoss
from tcam_wsol_video_tpu.ops.interpolate import resize_bilinear


def expand_compact_batch(batch):
    """Device-side inverse of data/pipeline.compact_batch
    (h2d_transfer=uint8): re-derive the normalized network input from the
    uint8 pixels and unpack the quantized CAM/roi/mask planes.  Runs
    inside the jitted step — the host ships ~5x fewer bytes and the
    VPU does the trivial normalize."""
    if "raw_u8" not in batch:
        return batch
    from tcam_wsol_video_tpu.core.constants import (IMAGENET_MEAN,
                                                    IMAGENET_STD)
    batch = dict(batch)
    raw = batch.pop("raw_u8").astype(jnp.float32)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    batch["raw_img"] = raw
    batch["image"] = (raw - mean) / std
    if "std_cam_u16" in batch:
        batch["std_cam"] = (batch.pop("std_cam_u16").astype(jnp.float32)
                            / 65535.0)
    if "roi" in batch and batch["roi"].dtype == jnp.uint8:
        batch["roi"] = batch["roi"].astype(jnp.int32)
    if "msk_bbox" in batch and batch["msk_bbox"].dtype == jnp.uint8:
        batch["msk_bbox"] = batch["msk_bbox"].astype(jnp.float32)
    return batch


def _apply_model(model, params, batch_stats, images, train, key=None):
    variables = {"params": params}
    mutable = []
    if batch_stats:
        variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if train else []
    rngs = {"dropout": key} if key is not None else None
    if train and mutable:
        out, upd = model.apply(variables, images, train=True,
                               rngs=rngs, mutable=mutable)
        return out, upd.get("batch_stats", batch_stats)
    out = model.apply(variables, images, train=train, rngs=rngs)
    return out, batch_stats


def make_train_step(model, master_loss: MasterLoss, optimizer, args,
                    seeder_cfg: Optional[TCAMSeederCfg] = None,
                    student_seed_source: bool = False,
                    classifier_model=None,
                    recompute_std_cams: bool = False,
                    jit: bool = True):
    """Returns train_step(state, batch, switches, key, seed_tech_weighted
    [, student_params, student_bstats]) -> (new_state, metrics dict).

    batch: image (B,H,W,3) normalized, label (B,), raw_img (B,H,W,3),
    std_cam (B,H,W), roi (B,H,W), msk_bbox (B,H,W), fg_size placeholder,
    valid (B,) — clip-major when knn_tc > 0.

    student_seed_source=True builds the epoch-switch variant (reference
    sl_tc_epoch_switch_to_sl, train_wsol.py:758-843): seed CAMs come from
    the best-so-far student's FCAMs instead of the stored classifier CAMs,
    with ROI/bbox re-extracted (ROI_LARGEST) and fg_size re-estimated,
    all on device.
    """
    task = args.task
    needs_seeds = task in (constants.F_CL, constants.TCAM) and (
        args.sl_tc or args.sl_fc)

    def _student_seed_inputs(student_params, student_bstats, images, key):
        """Best-student FCAM -> (cams_inter, roi, msk_bbox, fg_size)."""
        from tcam_wsol_video_tpu.cams.roi import roi_batch
        out, _ = _apply_model(model, student_params, student_bstats,
                              images, train=False)
        cams = ex.seg_cam(out["fcams"], argmax=False)          # (B, H, W)
        cams = jax.lax.stop_gradient(
            jnp.nan_to_num(cams, nan=0.0, posinf=1.0, neginf=0.0))
        cams = ex.normalize_minmax(cams)
        cams = jnp.nan_to_num(cams, nan=0.0)
        roi, msk_bbox, _boxes = roi_batch(
            cams, roi_method=constants.ROI_LARGEST,
            p_min_area_roi=args.sl_tc_roi_min_size)
        h, w = cams.shape[-2:]
        fg_size = jnp.sum((cams * roi).reshape(cams.shape[0], -1),
                          axis=-1) / float(h * w)
        return cams, roi, msk_bbox, fg_size

    def train_step(state: TrainState, batch, switches, key,
                   seed_weighted: jax.Array,
                   student_params=None, student_bstats=None):
        batch = expand_compact_batch(batch)
        k_seed, k_drop = jax.random.split(key)

        if recompute_std_cams and not student_seed_source:
            # no CAM store: rebuild seed CAMs from the frozen stage-1
            # classifier on the fly (reference get_std_cams_minibatch,
            # train_wsol.py:434-464); CAM method = classic fc-weight CAM
            assert classifier_model is not None
            cls_out, _ = _apply_model(classifier_model, student_params,
                                      student_bstats, batch["image"],
                                      train=False)
            fc_w = student_params["classification_head"]["fc"]["kernel"]
            cams_fly = ex.cam_fc_weights(cls_out["features"][-1], fc_w,
                                         batch["label"],
                                         args.support_background)
            cams_fly = jax.lax.stop_gradient(jnp.nan_to_num(cams_fly))
            if cams_fly.shape[-2:] != batch["image"].shape[1:3]:
                cams_fly = resize_bilinear(
                    cams_fly[..., None], batch["image"].shape[1:3],
                    align_corners=False)[..., 0]
            batch = dict(batch)
            batch["std_cam"] = jnp.clip(cams_fly, 0.0, 1.0)

        if student_seed_source:
            cams_sw, roi_sw, msk_bbox_sw, fg_size_sw = _student_seed_inputs(
                student_params, student_bstats, batch["image"], key)
            batch = dict(batch)
            batch["std_cam"] = cams_sw
            batch["roi"] = roi_sw
            batch["msk_bbox"] = msk_bbox_sw
            batch["fg_size"] = fg_size_sw

        seeds = None
        if needs_seeds:
            cams_inter = batch["std_cam"]
            roi = batch["roi"] if args.sl_tc_use_roi else None
            # seed technique is a schedule output; both branches are
            # traced but lax.cond executes only the active one at
            # runtime (jnp.where would compute BOTH seeders every step —
            # measured ~12 ms/step at recipe scale)
            if args.sl_tc_seed_tech == constants.SEED_WEIGHTED:
                seeds = jax.lax.cond(
                    seed_weighted.astype(bool),
                    lambda: tcam_seeder(k_seed, cams_inter, seeder_cfg,
                                        roi=roi,
                                        seed_tech=constants.SEED_WEIGHTED),
                    lambda: tcam_seeder(k_seed, cams_inter, seeder_cfg,
                                        roi=roi,
                                        seed_tech=constants.SEED_UNIFORM))
            else:
                seeds = tcam_seeder(k_seed, cams_inter, seeder_cfg, roi=roi,
                                    seed_tech=constants.SEED_UNIFORM)

        def loss_fn(params):
            def fwd(p):
                return _apply_model(model, p, state.batch_stats,
                                    batch["image"], train=True, key=k_drop)
            if getattr(args, "remat", False):
                # recompute the forward during backprop instead of
                # holding activations (see hparams "remat")
                fwd = jax.checkpoint(fwd)
            out, new_bs = fwd(params)
            if task == constants.STD_CL:
                logits = out["cl_logits"]
                inputs = LossInputs(cl_logits=logits, glabel=batch["label"])
            else:
                logits = out["cl_logits"]
                inputs = LossInputs(
                    cams_inter=batch.get("std_cam"),
                    fcams=out["fcams"],
                    cl_logits=logits,
                    glabel=batch["label"],
                    raw_img=batch["raw_img"],
                    x_in=batch["image"],
                    im_recon=out["im_recon"],
                    seeds=seeds,
                    seq_iter=batch.get("seq_iter"),
                    frm_iter=batch.get("frm_iter"),
                    fg_size=batch.get("fg_size"),
                    msk_bbox=batch.get("msk_bbox"),
                )
            loss_chunk = int(getattr(args, "loss_chunk", 0))
            if loss_chunk > 0 and task != constants.STD_CL:
                # rematerialized sample-group chunking of the loss side:
                # backward holds one group's (chunk, P) buffers at a
                # time — the aggregate that walls bs256 (PARITY r4 #7)
                total, holder = master_loss.compute_chunked(
                    inputs, state.elb_t, switches, loss_chunk)
            else:
                total, holder = master_loss.compute(inputs, state.elb_t,
                                                    switches)
            return total, (holder, new_bs, logits)

        (loss, (holder, new_bs, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)

        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones(logits.shape[0], bool)
        pred = jnp.argmax(logits, axis=-1)
        n_correct = jnp.sum((pred == batch["label"]) & valid)
        n = jnp.sum(valid)

        new_state = state.replace(params=new_params, batch_stats=new_bs,
                                  opt_state=new_opt,
                                  step=state.step + 1)
        metrics = {"loss": loss, "n_correct": n_correct, "n": n, **holder}
        return new_state, metrics

    # jit=False hands back the raw body for callers that fuse it into a
    # larger program (the K-step scan runner, engine/scan_train.py)
    return jax.jit(train_step) if jit else train_step


def make_forward_fn(model):
    """Jitted batched forward returning the model's output dict."""
    @jax.jit
    def forward(params, batch_stats, images):
        out, _ = _apply_model(model, params, batch_stats, images,
                              train=False)
        return out
    return forward


def make_cam_eval_step(model, args, classifier_model=None):
    """Jitted batched CAM computation for evaluation.

    Returns eval_step(params, batch_stats, images, targets, key) ->
    (cams (B, crop, crop) in [0, 1] nan-guarded, cl_logits).
    Mirrors get_cam_one_sample (inference_wsol.py:248-374) but batched.
    """
    task = args.task
    method = args.method
    crop = args.crop_size
    support_bg = args.support_background

    def _std_cam(params, batch_stats, images, targets, key):
        out, _ = _apply_model(model, params, batch_stats, images,
                              train=False)
        logits = out["cl_logits"]
        feats = out["features"][-1]

        def head_fn(f):
            h_out = model.apply({"params": params,
                                 **({"batch_stats": batch_stats}
                                    if batch_stats else {})},
                                f, train=False,
                                method="head_from_features")
            return h_out[0]

        if method == constants.METHOD_CAM:
            fc_w = params["classification_head"]["fc"]["kernel"]
            cam = ex.cam_fc_weights(feats, fc_w, targets, support_bg)
        elif method == constants.METHOD_GRADCAM:
            cam = ex.grad_cam(head_fn, feats, targets)
        elif method == constants.METHOD_GRADCAMPP:
            cam = ex.grad_cam_pp(head_fn, feats, targets)
        elif method == constants.METHOD_XGRADCAM:
            cam = ex.xgrad_cam(head_fn, feats, targets)
        elif method == constants.METHOD_LAYERCAM:
            cam = ex.layer_cam(head_fn, feats, targets)
        elif method == constants.METHOD_SMOOTHGRADCAMPP:
            def feats_fn(x):
                o, _ = _apply_model(model, params, batch_stats, x,
                                    train=False)
                return o["features"][-1]
            cam = ex.smooth_grad_cam_pp(
                feats_fn, head_fn, images, targets, key,
                num_samples=int(getattr(args, "sgcampp_num_samples", 4)))
        elif method in (constants.METHOD_GAP, constants.METHOD_MAXPOOL,
                        constants.METHOD_LSE, constants.METHOD_WILDCAT):
            cam = ex.builtin_cam(out["cams_head"], targets, support_bg)
        elif method in (constants.METHOD_SCORECAM, constants.METHOD_SSCAM,
                        constants.METHOD_ISCAM):
            def logits_fn(x):
                o, _ = _apply_model(model, params, batch_stats, x,
                                    train=False)
                return o["cl_logits"]
            if method == constants.METHOD_SCORECAM:
                cam = ex.score_cam(logits_fn, images, feats, targets)
            elif method == constants.METHOD_SSCAM:
                # reference class defaults: 35 samples, std 2.0
                # (cam.py:293-295); override via args for CI budgets
                cam = ex.sscam(
                    logits_fn, images, feats, targets, key,
                    num_samples=int(getattr(args, "sscam_num_samples", 35)))
            else:
                cam = ex.iscam(
                    logits_fn, images, feats, targets,
                    num_samples=int(getattr(args, "iscam_num_samples", 10)))
        else:  # pragma: no cover
            raise NotImplementedError(method)
        return cam, logits

    use_crf_pp = bool(getattr(args, "crf_post_process", False))
    crf_pp_iters = int(getattr(args, "crf_pp_iters", 5))
    # device->host transfer format for the protocol sweep: uint16 packs
    # the [0,1] CAM into 2 bytes — halves-to-quarters the readback that
    # dominates eval wall-clock on bandwidth-starved host links; the
    # evaluator dequantizes right after np.asarray.  For box datasets
    # the CAM is first floored to the uint8/255 grid the cv2 protocol
    # quantizes to anyway ((scoremap*255).astype(uint8), reference
    # wsol_metrics.py:155): k/255 -> uint16 k*257 -> /65535 -> k/255 is
    # exact for every k (verified over all 256 values), so the uint16
    # path is BIT-IDENTICAL to float32 there — a bare round-to-65535
    # could shift cam*255 by ~0.002 across an integer boundary and flip
    # a uint8 bin (advisor r3).  Mask datasets (PxAP consumes the float
    # CAM directly) keep full 1/65535 resolution: error 7.6e-6, ~130x
    # finer than the .001 tau grid.
    transfer = str(getattr(args, "eval_transfer", "float32"))
    box_protocol = args.dataset != constants.OpenImages

    @jax.jit
    def eval_step(params, batch_stats, images, targets, key,
                  raw_images=None):
        if images.dtype == jnp.uint8:   # h2d_transfer=uint8 eval upload
            from tcam_wsol_video_tpu.core.constants import (IMAGENET_MEAN,
                                                            IMAGENET_STD)
            raw_f = images.astype(jnp.float32)
            mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
            std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
            images = (raw_f - mean) / std
            if use_crf_pp and raw_images is None:
                raw_images = raw_f
        if task == constants.STD_CL:
            cam, logits = _std_cam(params, batch_stats, images, targets, key)
        elif task in (constants.F_CL, constants.TCAM):
            out, _ = _apply_model(model, params, batch_stats, images,
                                  train=False)
            cam = ex.seg_cam(out["fcams"], argmax=False)
            logits = out["cl_logits"]
        else:  # pragma: no cover
            raise NotImplementedError(task)
        cam = jnp.nan_to_num(cam.astype(jnp.float32), nan=0.0, posinf=1.0,
                             neginf=0.0)
        if cam.shape[-2:] != (crop, crop):
            cam = resize_bilinear(cam[..., None], (crop, crop),
                                  align_corners=False)[..., 0]
        cam = jnp.clip(cam, 0.0, 1.0)
        if use_crf_pp and raw_images is not None:
            # inference-time mean-field refinement (reference
            # DenseCRFFilter capability, crf_post_processing.py)
            from tcam_wsol_video_tpu.ops.crf_inference import \
                mean_field_refine
            probs = jnp.stack([1.0 - cam, cam], axis=-1)
            cam = mean_field_refine(raw_images, probs,
                                    num_iters=crf_pp_iters)[..., 1]
            cam = jnp.clip(jnp.nan_to_num(cam), 0.0, 1.0)
        if transfer == "uint16":
            if box_protocol:
                cam = jnp.floor(cam * 255.0) / 255.0
            cam = jnp.round(cam * 65535.0).astype(jnp.uint16)
        elif transfer == "uint8":
            # floor(cam*255) IS the protocol's own quantization
            # ((scoremap*255).astype(uint8) truncates, reference
            # wsol_metrics.py:155), so on box datasets the 1-byte
            # transfer is BIT-IDENTICAL to float32 at half uint16's
            # readback.  Mask datasets (PxAP reads the float CAM):
            # nearest-bin error 1/510 ~ 2e-3 — approximate there,
            # hence opt-in and asserted box-only in hparams.finalize.
            cam = jnp.floor(cam * 255.0).astype(jnp.uint8)
        return cam, logits

    return eval_step


def dequantize_cams_np(cams_np):
    """Undo make_cam_eval_step's eval_transfer packing after readback:
    uint16 -> /65535 (box CAMs pre-floored to the uint8/255 grid, so
    bit-identical to float32); uint8 -> /255 (IS the box protocol's own
    quantization).  Lives next to the packing it inverts; consumed by
    the evaluator, the trainer's CAM-progress plots, and demo_video."""
    import numpy as _np
    if cams_np.dtype == _np.uint16:
        return cams_np.astype(_np.float32) / 65535.0
    if cams_np.dtype == _np.uint8:
        return cams_np.astype(_np.float32) / 255.0
    return cams_np


def make_classifier_cam_fn(classifier_model, args):
    """Batched stage-1 CAM recomputation from the frozen seeder classifier
    — used when stored CAMs are absent (reference get_std_cams_minibatch,
    train_wsol.py:434-464) and to dump the CAM store offline."""
    method = args.method
    support_bg = args.support_background

    @jax.jit
    def cam_fn(params, batch_stats, images, targets):
        out, _ = _apply_model(classifier_model, params, batch_stats, images,
                              train=False)
        feats = out["features"][-1]
        if method == constants.METHOD_CAM:
            fc_w = params["classification_head"]["fc"]["kernel"]
            cam = ex.cam_fc_weights(feats, fc_w, targets, support_bg)
        else:
            cam = ex.builtin_cam(out["cams_head"], targets, support_bg)
        return jnp.nan_to_num(cam, nan=0.0, posinf=1.0, neginf=0.0)

    return cam_fn
