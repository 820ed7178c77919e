"""TCAM losses.

Parity targets (/root/reference/dlib/losses/tcam.py):
- SelfLearningTcams (:48-77): CE(fcams, seeds) with ignore index;
- ConRanFieldTcams (:80-115): spatial DenseCRF on (raw_img, softmax fcams);
- RgbJointConRanFieldTcams (:158-232): temporal color-only CRF — each
  clip's frames concatenated along width, ColorDenseCRF per clip, averaged
  over clips with >= 2 frames;
- MaxSizePositiveTcams (:235-278): ELB(-area) per channel / 2;
- BgSizeGreatSizeFgTcams (:281-323): ELB(fg - bg);
- FgSizeTcams (:326-380): two-sided ELB around the temporal fg-size
  estimate +- eps;
- EmptyOutsideBboxTcams (:383-430): ELB(area(fg outside bbox));
- EntropyTcams (:118-155): pixelwise entropy.

TPU-native: the clip structure is static (the pipeline emits clip-major
contiguous batches of clip_len frames, frm_iter ascending), so the joint
CRF is a reshape + width-concat instead of the reference's python grouping
loop (group_ordered_frames, tcam.py:32-45).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tcam_wsol_video_tpu.losses.core import (ElementaryLoss, LossInputs,
                                             softmax_fcams)
from tcam_wsol_video_tpu.losses.elb import elb
from tcam_wsol_video_tpu.losses.fcam import cross_entropy_ignore
from tcam_wsol_video_tpu.ops.crf import color_dense_crf_loss, dense_crf_loss


class SelfLearningTcams(ElementaryLoss):
    def compute(self, inputs: LossInputs, t) -> jax.Array:
        return self.lambda_ * cross_entropy_ignore(
            inputs.fcams, inputs.seeds, self.seg_ignore_idx)

    def compute_numden(self, inputs: LossInputs, t):
        from tcam_wsol_video_tpu.losses.fcam import \
            cross_entropy_ignore_sum_count
        s, n = cross_entropy_ignore_sum_count(inputs.fcams, inputs.seeds,
                                              self.seg_ignore_idx)
        return self.lambda_ * s, n


class ConRanFieldTcams(ElementaryLoss):
    def __init__(self, sigma_rgb=15.0, sigma_xy=100.0, scale_factor=1.0,
                 impl="exact", n_landmarks=1024, rff_freqs=2048, **kw):
        super().__init__(**kw)
        self.sigma_rgb = sigma_rgb
        self.sigma_xy = sigma_xy
        self.scale_factor = scale_factor
        self.impl = impl
        self.n_landmarks = n_landmarks
        self.rff_freqs = rff_freqs

    def compute(self, inputs: LossInputs, t) -> jax.Array:
        probs = softmax_fcams(inputs.fcams)
        return self.lambda_ * dense_crf_loss(
            inputs.raw_img, probs, self.sigma_rgb, self.sigma_xy,
            self.scale_factor, method=self.impl,
            n_landmarks=self.n_landmarks, rff_freqs=self.rff_freqs)


class RgbJointConRanFieldTcams(ElementaryLoss):
    """Temporal joint CRF.  clip_len is static: batch rows are clip-major
    contiguous, frames ordered by frm_iter (pipeline contract)."""

    def __init__(self, clip_len: int, sigma_rgb=15.0, scale_factor=1.0,
                 impl="exact", n_landmarks=1024, rff_freqs=2048, **kw):
        super().__init__(**kw)
        assert clip_len >= 1
        self.clip_len = clip_len
        self.sigma_rgb = sigma_rgb
        self.scale_factor = scale_factor
        self.impl = impl
        self.n_landmarks = n_landmarks
        self.rff_freqs = rff_freqs

    def compute(self, inputs: LossInputs, t) -> jax.Array:
        if self.clip_len < 2:
            return jnp.float32(0.0)
        probs = softmax_fcams(inputs.fcams)
        b, h, w, k = probs.shape
        n_clips = b // self.clip_len
        assert n_clips * self.clip_len == b, (b, self.clip_len)
        # (n_clips, T, H, W, C) -> concat along width -> (n_clips, H, T*W, C)
        imgs = inputs.raw_img.reshape(n_clips, self.clip_len, h, w, 3)
        imgs = jnp.concatenate(jnp.moveaxis(imgs, 1, 0), axis=2)
        pc = probs.reshape(n_clips, self.clip_len, h, w, k)
        pc = jnp.concatenate(jnp.moveaxis(pc, 1, 0), axis=2)
        # ColorDenseCRF already divides by the (clip) batch size, matching
        # the reference's per-clip calls + mean over clips
        return self.lambda_ * color_dense_crf_loss(
            imgs, pc, self.sigma_rgb, self.scale_factor, method=self.impl,
            n_landmarks=self.n_landmarks, rff_freqs=self.rff_freqs)


class EntropyTcams(ElementaryLoss):
    def compute(self, inputs: LossInputs, t) -> jax.Array:
        probs = softmax_fcams(inputs.fcams)
        ent = -jnp.sum(probs * jnp.log2(jnp.maximum(probs, 1e-12)), axis=-1)
        return self.lambda_ * jnp.mean(ent)


class MaxSizePositiveTcams(ElementaryLoss):
    def compute(self, inputs: LossInputs, t) -> jax.Array:
        probs = softmax_fcams(inputs.fcams)
        b = probs.shape[0]
        loss = jnp.float32(0.0)
        for c in (0, 1):
            area = jnp.sum(probs[..., c].reshape(b, -1), axis=-1)
            loss = loss + elb(-area, t)
        return self.lambda_ * loss * 0.5


class BgSizeGreatSizeFgTcams(ElementaryLoss):
    def compute(self, inputs: LossInputs, t) -> jax.Array:
        probs = softmax_fcams(inputs.fcams)
        b = probs.shape[0]
        bg = jnp.sum(probs[..., 0].reshape(b, -1), axis=-1)
        fg = jnp.sum(probs[..., 1].reshape(b, -1), axis=-1)
        return self.lambda_ * elb(-(bg - fg), t)


class FgSizeTcams(ElementaryLoss):
    def __init__(self, eps: float = 0.001, **kw):
        super().__init__(**kw)
        assert eps >= 0
        self.eps = float(eps)

    def compute(self, inputs: LossInputs, t) -> jax.Array:
        probs = softmax_fcams(inputs.fcams)
        b, h, w, _ = probs.shape
        fg = jnp.sum(probs[..., 1].reshape(b, -1), axis=-1) / float(h * w)
        loss = elb(inputs.fg_size - self.eps - fg, t)
        loss = loss + elb(fg - inputs.fg_size - self.eps, t)
        return self.lambda_ * loss / 2.0


class EmptyOutsideBboxTcams(ElementaryLoss):
    def compute(self, inputs: LossInputs, t) -> jax.Array:
        probs = softmax_fcams(inputs.fcams)
        b = probs.shape[0]
        out = probs[..., 1] * (1.0 - inputs.msk_bbox)
        area = jnp.sum(out.reshape(b, -1), axis=-1)
        return self.lambda_ * elb(area, t)
