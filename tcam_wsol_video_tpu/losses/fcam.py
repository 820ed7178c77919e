"""F_CL (FCAM) losses.

Parity targets (/root/reference/dlib/losses/fcam.py):
- SelfLearningFcams (:70-110): CE(fcams, seeds) with ignore index;
- ConRanFieldFcams (:113-159): DenseCRFLoss on (raw_img, softmax fcams);
- EntropyFcams (:162-210): pixelwise entropy (log2) of the softmax maps;
- MaxSizePositiveFcams (:213-267): ELB(-area) on both channels;
- ImgReconstruction (:27-67): ELB over per-sample MSE (or plain mean MSE
  without ELB, reference config im_rec_elb).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tcam_wsol_video_tpu.losses.core import (ElementaryLoss, LossInputs,
                                             softmax_fcams)
from tcam_wsol_video_tpu.losses.elb import elb
from tcam_wsol_video_tpu.ops.crf import dense_crf_loss


def cross_entropy_ignore(fcams_logits: jax.Array, seeds: jax.Array,
                         ignore_idx: int) -> jax.Array:
    """Mean CE over non-ignored pixels (torch CrossEntropyLoss with
    ignore_index semantics).  fcams_logits: (B, H, W, K); seeds (B, H, W)
    int in {0..K-1, ignore_idx}."""
    valid = seeds != ignore_idx
    tgt = jnp.where(valid, seeds, 0)
    logp = jax.nn.log_softmax(fcams_logits.astype(jnp.float32), axis=-1)
    # one-hot contraction instead of take_along_axis: a minor-axis gather
    # lowers to a serialized per-element access on TPU (measured 26 ms at
    # bs32 224^2); the one-hot multiply-sum is pure VPU (sub-ms)
    oh = jax.nn.one_hot(tgt, logp.shape[-1], dtype=logp.dtype)
    nll = -jnp.sum(logp * oh, axis=-1)
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom


def cross_entropy_ignore_sum_count(fcams_logits: jax.Array,
                                   seeds: jax.Array, ignore_idx: int):
    """(sum of per-pixel NLL over valid pixels, valid count) — the
    chunk-decomposable form of cross_entropy_ignore: the valid count is
    data-dependent, so chunked evaluation must carry the true
    denominator (core.MasterLoss.compute_chunked)."""
    valid = seeds != ignore_idx
    tgt = jnp.where(valid, seeds, 0)
    logp = jax.nn.log_softmax(fcams_logits.astype(jnp.float32), axis=-1)
    oh = jax.nn.one_hot(tgt, logp.shape[-1], dtype=logp.dtype)
    nll = -jnp.sum(logp * oh, axis=-1)
    return (jnp.sum(jnp.where(valid, nll, 0.0)),
            jnp.sum(valid).astype(jnp.float32))


class SelfLearningFcams(ElementaryLoss):
    def compute(self, inputs: LossInputs, t) -> jax.Array:
        return self.lambda_ * cross_entropy_ignore(
            inputs.fcams, inputs.seeds, self.seg_ignore_idx)

    def compute_numden(self, inputs: LossInputs, t):
        s, n = cross_entropy_ignore_sum_count(inputs.fcams, inputs.seeds,
                                              self.seg_ignore_idx)
        return self.lambda_ * s, n


class ConRanFieldFcams(ElementaryLoss):
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


class EntropyFcams(ElementaryLoss):
    def compute(self, inputs: LossInputs, t) -> jax.Array:
        probs = softmax_fcams(inputs.fcams)
        ent = -jnp.sum(probs * jnp.log2(jnp.maximum(probs, 1e-12)), axis=-1)
        return self.lambda_ * jnp.mean(ent)


class MaxSizePositiveFcams(ElementaryLoss):
    def compute(self, inputs: LossInputs, t) -> jax.Array:
        probs = softmax_fcams(inputs.fcams)
        b = probs.shape[0]
        loss = jnp.float32(0.0)
        for c in (0, 1):
            area = jnp.sum(probs[..., c].reshape(b, -1), axis=-1)
            loss = loss + elb(-area, t)
        return self.lambda_ * loss * 0.5


class ImgReconstruction(ElementaryLoss):
    def __init__(self, use_elb: bool = False, **kw):
        super().__init__(**kw)
        self.use_elb = use_elb

    def compute(self, inputs: LossInputs, t) -> jax.Array:
        n = inputs.x_in.shape[0]
        mse = jnp.mean(
            ((inputs.x_in - inputs.im_recon) ** 2).reshape(n, -1), axis=1)
        if self.use_elb:
            return self.lambda_ * elb(mse, t)
        return self.lambda_ * jnp.mean(mse)
