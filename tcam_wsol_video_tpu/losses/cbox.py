"""C_BOX losses: ELB constraints on predicted box geometry / classifier
scores / seeds, + smooth-L1 box-bounds regression.

Parity target: /root/reference/dlib/losses/cbox.py:25-290 —
- AreaBox: ELB over (-area, area - HW) of valid boxes;
- ClScoring: ELB over (clean - fg, bg - clean) class logits of valid
  boxes (the object region must explain the class score);
- SeedCbox: CE((mask_bg, mask_fg), seeds) with ignore index over valid
  boxes;
- BoxBounds: smooth-L1 between the predicted corners and prior corners.

Jit-safe: the reference indexes valid boxes; we weight by validity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tcam_wsol_video_tpu.losses.core import ElementaryLoss, LossInputs
from tcam_wsol_video_tpu.losses.elb import elb_masked

Array = jax.Array


class CBoxInputs(LossInputs):
    """LossInputs extension carrying the C_BOX tensors (reference
    mega-kwargs, cbox.py:31-53)."""

    def __init__(self, x_hat=None, y_hat=None, valid=None, area=None,
                 m_fg=None, m_bg=None, logits_fg=None, logits_bg=None,
                 logits_clean=None, pre_x_hat=None, pre_y_hat=None,
                 area_normed: bool = False, **kw):
        super().__init__(**kw)
        self.x_hat = x_hat
        self.y_hat = y_hat
        self.valid = valid
        self.area = area
        self.m_fg = m_fg
        self.m_bg = m_bg
        self.logits_fg = logits_fg
        self.logits_bg = logits_bg
        self.logits_clean = logits_clean
        self.pre_x_hat = pre_x_hat
        self.pre_y_hat = pre_y_hat
        self.area_normed = area_normed


class AreaBox(ElementaryLoss):
    def compute(self, inputs: CBoxInputs, t) -> Array:
        area = inputs.area.reshape(-1)
        valid = inputs.valid.reshape(-1)
        h, w = inputs.m_fg.shape[-2:]
        if inputs.area_normed:
            area = area / float(h * w)
            upper = 1.0
        else:
            upper = float(h * w)
        fx = jnp.concatenate([-area, area - upper])
        m = jnp.concatenate([valid, valid])
        return self.lambda_ * elb_masked(fx, t, m)


class ClScoring(ElementaryLoss):
    def compute(self, inputs: CBoxInputs, t) -> Array:
        g = inputs.glabel[:, None]
        fg = jnp.take_along_axis(inputs.logits_fg, g, axis=1)[:, 0]
        bg = jnp.take_along_axis(inputs.logits_bg, g, axis=1)[:, 0]
        cl = jnp.take_along_axis(inputs.logits_clean, g, axis=1)[:, 0]
        valid = inputs.valid.reshape(-1)
        fx = jnp.concatenate([cl - fg, bg - cl])
        m = jnp.concatenate([valid, valid])
        return self.lambda_ * elb_masked(fx, t, m)


class SeedCbox(ElementaryLoss):
    def compute(self, inputs: CBoxInputs, t) -> Array:
        seg = jnp.stack([inputs.m_bg, inputs.m_fg], axis=-1)  # B,h,w,2
        seeds = inputs.seeds
        valid_px = (seeds != self.seg_ignore_idx) & \
            (inputs.valid.reshape(-1, 1, 1) > 0)
        tgt = jnp.where(seeds != self.seg_ignore_idx, seeds, 0)
        logp = jax.nn.log_softmax(seg.astype(jnp.float32), axis=-1)
        # one-hot contraction: minor-axis gathers serialize on TPU
        # (see losses/fcam.cross_entropy_ignore)
        oh = jax.nn.one_hot(tgt, logp.shape[-1], dtype=logp.dtype)
        nll = -jnp.sum(logp * oh, axis=-1)
        nll = jnp.where(valid_px, nll, 0.0)
        return self.lambda_ * jnp.sum(nll) / jnp.maximum(
            jnp.sum(valid_px), 1)


class BoxBounds(ElementaryLoss):
    def compute(self, inputs: CBoxInputs, t) -> Array:
        p = jnp.concatenate([inputs.x_hat.reshape(-1),
                             inputs.y_hat.reshape(-1)])
        pre = jnp.concatenate([inputs.pre_x_hat.reshape(-1),
                               inputs.pre_y_hat.reshape(-1)])
        diff = pre - p
        ad = jnp.abs(diff)
        small = (ad < 1.0).astype(jnp.float32)
        loss = diff ** 2 * 0.5 * small + (ad - 0.5) * (1.0 - small)
        return self.lambda_ * jnp.mean(loss)


def get_loss_cbox(args):
    """Per-flag assembly (reference instantiators.get_loss_cbox :255-315):
    same flag names (cb_*_l lambdas, cb_pp_box gating BoxBounds) and the
    same per-loss epoch windows."""
    from tcam_wsol_video_tpu.losses.core import MasterLoss
    ml = MasterLoss()
    c = dict(support_background=args.support_background,
             multi_label_flag=args.multi_label_flag,
             seg_ignore_idx=args.seg_ignore_idx)
    if args.cb_area_box:
        ml.add(AreaBox(lambda_=args.cb_area_box_l,
                       start_ep=args.cb_area_box_start_epoch,
                       end_ep=args.cb_area_box_end_epoch, **c))
    if args.cb_cl_score:
        ml.add(ClScoring(lambda_=args.cb_cl_score_l,
                         start_ep=args.cb_cl_score_start_epoch,
                         end_ep=args.cb_cl_score_end_epoch, **c))
    if args.cb_seed:
        ml.add(SeedCbox(lambda_=args.cb_seed_l,
                        start_ep=args.cb_seed_start_epoch,
                        end_ep=args.cb_seed_end_epoch, **c))
    if args.cb_pp_box:
        ml.add(BoxBounds(lambda_=args.cb_pp_box_l,
                         start_ep=args.cb_pp_box_start_epoch,
                         end_ep=args.cb_pp_box_end_epoch, **c))
    assert ml.losses, "C_BOX training requires at least one loss flag"
    return ml
