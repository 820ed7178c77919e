"""C_BOX task: jitted train / eval steps.

Parity target: the reference's C_BOX flow (/root/reference/dlib/learning/
train_wsol.py:610-700 pre-forward + :884-940 training forward):

per batch, one step does
1. pre-forward (no grad): current box -> clamped (x_hat, y_hat); invalid
   or too-small boxes replaced by random boxes of minimum size
   (_gen_rand_init_box) — these become the BoxBounds regression targets;
2. forward: raw box scores -> differentiable fg/bg masks (ops/box_stats);
3. composite images: fg-focused = m_fg*img + m_bg*blur(img) (+ bg-focused
   and clean) scored by the FROZEN stage-1 classifier;
4. seeds sampled from the stored stage-1 CAMs (FCAM seeder);
5. losses: AreaBox + ClScoring + SeedCbox + BoxBounds (ELB-constrained).

TPU-native: everything (blur included) fuses into one jitted step; the
frozen classifier is a second parameter tree in the same program.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tcam_wsol_video_tpu.cams.seeding import CBoxSeederCfg, cbox_seeder
from tcam_wsol_video_tpu.core import constants
from tcam_wsol_video_tpu.engine.state import TrainState
from tcam_wsol_video_tpu.engine.steps import _apply_model
from tcam_wsol_video_tpu.losses.cbox import CBoxInputs
from tcam_wsol_video_tpu.losses.core import MasterLoss
from tcam_wsol_video_tpu.ops import box_stats as bs

Array = jax.Array


def _init_boxes(key: jax.Array, n: int, h: int, w: int, minsz: Array,
                size_mean: float, size_var: float) -> tuple:
    """Centered fallback boxes of area fraction
    s ~ N(size_mean, scale=size_var) clamped to [minsz, 0.99] (reference
    _gen_rand_init_box, train_wsol.py:521-541 — note the reference passes
    cb_init_box_var directly as np.random.normal's scale, i.e. it is a
    std despite the name; we match that).  minsz: (n,) per-sample minimum
    (per-class size prior or the constant flag)."""
    s = size_mean + size_var * jax.random.normal(key, (n,))
    s = jnp.clip(s, minsz, 0.99)
    half = jnp.sqrt(s) / 2.0
    x_hat = jnp.stack([jnp.maximum(h / 2.0 - h * half, 0.0),
                       jnp.minimum(h / 2.0 + h * half, h - 1.0)], axis=1)
    y_hat = jnp.stack([jnp.maximum(w / 2.0 - w * half, 0.0),
                       jnp.minimum(w / 2.0 + w * half, w - 1.0)], axis=1)
    return x_hat, y_hat   # reference x binds the height axis


def make_cbox_train_step(model, classifier_model, master_loss: MasterLoss,
                         optimizer, args,
                         seeder_cfg: Optional[CBoxSeederCfg] = None,
                         size_priors_min_s=None):
    """size_priors_min_s: (num_classes,) per-class minimum box-area
    fraction from the validation split's GT boxes — consumed when
    cb_pp_box_min_size_type == SIZE_DATA (reference vl_size_priors
    threading, train_wsol.py:347-351 + 664-680)."""
    h = w = args.crop_size
    scale_domain = args.cb_scale_domain
    needs_seeds = args.cb_seed
    use_prior = (args.cb_pp_box_min_size_type == constants.SIZE_DATA
                 and size_priors_min_s is not None)
    priors = (jnp.asarray(size_priors_min_s, jnp.float32)
              if use_prior else None)

    def train_step(state: TrainState, batch, switches, key,
                   cls_params, cls_bstats):
        from tcam_wsol_video_tpu.engine.steps import expand_compact_batch
        batch = expand_compact_batch(batch)
        k_seed, k_rand = jax.random.split(key)
        images = batch["image"]
        n = images.shape[0]

        minsz = (priors[batch["label"]] if use_prior
                 else jnp.full((n,), args.cb_pp_box_min_size, jnp.float32))

        # 1. pre-forward: sanitized previous prediction as bounds target
        out_pre, _ = _apply_model(model, state.params, state.batch_stats,
                                  images, train=False)
        px, py, pvalid, parea, _, _ = bs.box_stats(
            jax.lax.stop_gradient(out_pre["box"]), h, w, scale_domain,
            eval_mode=True)
        rx, ry = _init_boxes(k_rand, n, h, w, minsz,
                             args.cb_init_box_size, args.cb_init_box_var)
        bad = (pvalid == 0) | (parea / float(h * w) < minsz)
        pre_x = jnp.where(bad[:, None], rx, px)
        pre_y = jnp.where(bad[:, None], ry, py)

        # seeds from the stage-1 CAM store
        seeds = None
        if needs_seeds:
            seeds = cbox_seeder(k_seed, batch["std_cam"], seeder_cfg)

        blurred = bs.gaussian_blur(images,
                                   ksize=args.cb_cl_score_blur_ksize,
                                   sigma=args.cb_cl_score_blur_sigma)

        def loss_fn(params):
            out, new_bstats = _apply_model(model, params, state.batch_stats,
                                           images, train=True)
            box = out["box"]
            x, y, valid, area, m_fg, m_bg = bs.box_stats(
                box, h, w, scale_domain)
            img_fg = bs.compose_fg_image(images, blurred, m_fg, m_bg)
            cls_out, _ = _apply_model(classifier_model, cls_params,
                                      cls_bstats, img_fg, train=False)
            logits_fg = cls_out["cl_logits"]
            logits_bg = logits_clean = None
            if args.cb_cl_score:
                img_bg = bs.compose_bg_image(images, blurred, m_fg, m_bg)
                logits_bg = _apply_model(classifier_model, cls_params,
                                         cls_bstats, img_bg,
                                         train=False)[0]["cl_logits"]
                logits_clean = _apply_model(classifier_model, cls_params,
                                            cls_bstats, images,
                                            train=False)[0]["cl_logits"]
            inputs = CBoxInputs(
                glabel=batch["label"], raw_img=batch["raw_img"],
                x_in=images, seeds=seeds,
                x_hat=x, y_hat=y, valid=valid[:, None],
                area=area[:, None], m_fg=m_fg, m_bg=m_bg,
                logits_fg=logits_fg, logits_bg=logits_bg,
                logits_clean=logits_clean,
                pre_x_hat=pre_x, pre_y_hat=pre_y)
            total, holder = master_loss.compute(inputs, state.elb_t,
                                                switches)
            return total, (holder, new_bstats, logits_fg, valid)

        (loss, (holder, new_bstats, logits, valid)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                            state.params, updates)
        bvalid = batch.get("valid")
        if bvalid is None:
            bvalid = jnp.ones(n, bool)
        pred = jnp.argmax(logits, axis=-1)
        metrics = {
            "loss": loss,
            "n_correct": jnp.sum((pred == batch["label"]) & bvalid),
            "n": jnp.sum(bvalid),
            "valid_boxes": jnp.sum(valid * bvalid),
            **holder,
        }
        new_state = state.replace(params=new_params, batch_stats=new_bstats,
                                  opt_state=new_opt, step=state.step + 1)
        return new_state, metrics

    return jax.jit(train_step)


def make_cbox_eval_step(model, classifier_model, args):
    """Returns eval_step(params, bstats, cls_params, cls_bstats, images)
    -> (boxes_xyxy (B, 4) public x0y0x1y1 format, valid (B,), logits).

    Mirrors get_cam_one_sample's C_BOX path (inference_wsol.py:289-314):
    the box is clamped, validity flagged, and classification scored on the
    fg-focused composite.
    """
    h = w = args.crop_size
    scale_domain = args.cb_scale_domain

    @jax.jit
    def eval_step(params, bstats, cls_params, cls_bstats, images):
        if images.dtype == jnp.uint8:   # h2d_transfer=uint8 eval upload
            from tcam_wsol_video_tpu.core.constants import (IMAGENET_MEAN,
                                                            IMAGENET_STD)
            mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
            std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
            images = (images.astype(jnp.float32) - mean) / std
        out, _ = _apply_model(model, params, bstats, images, train=False)
        x, y, valid, area, m_fg, m_bg = bs.box_stats(
            out["box"], h, w, scale_domain, eval_mode=True)
        blurred = bs.gaussian_blur(images,
                                   ksize=args.cb_cl_score_blur_ksize,
                                   sigma=args.cb_cl_score_blur_sigma)
        img_fg = bs.compose_fg_image(images, blurred, m_fg, m_bg)
        logits = _apply_model(classifier_model, cls_params, cls_bstats,
                              img_fg, train=False)[0]["cl_logits"]
        # reference x binds the height axis: public box = (y, x) swapped
        boxes = jnp.stack([y[:, 0], x[:, 0], y[:, 1], x[:, 1]], axis=1)
        return boxes, valid, logits

    return eval_step
