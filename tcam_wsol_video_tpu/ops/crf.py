"""Dense-CRF regularization as Gaussian-kernel attention on the MXU.

The reference computes AS = W s with W_ij = exp(-1/2 ||f_i - f_j||^2) over
features f = (x/sigma_xy, y/sigma_xy, rgb/sigma_rgb), approximated by a
CPU permutohedral lattice behind SWIG+OpenMP
(/root/reference/dlib/crf/crfwrapper/bilateralfilter/bilateralfilter.cpp:4-55)
and wrapped in an autograd.Function whose backward treats AS as a constant:
loss = -sum(s * AS) / N, d loss / d s = -2 * AS / N
(/root/reference/dlib/crf/dense_crf_loss.py:32-74).

TPU-native design: the filter is *unnormalized Gaussian-kernel attention*
with a 5-dim feature space —

    d2_ij = ||f_i||^2 + ||f_j||^2 - 2 f_i . f_j      (one small matmul)
    AS    = exp(-d2 / 2) @ s                         (one big matmul)

so the whole thing rides the MXU, tiled flash-attention style so the P x P
score matrix never materializes.  This computes the *exact* dense kernel
the permutohedral lattice only approximates.  The e^x are the cost:
P^2 transcendentals per image; use `scale` (reference crf_scale) to
downsample when sigmas allow it — with sigma_xy=100 at 224 px the spatial
kernel is nearly flat, so modest downscaling loses almost nothing.

A Pallas kernel for the inner tile loop lives in ops/pallas/bilateral.py;
this module's lax.map tiling is the portable path and the correctness
oracle (they share `_row_block`).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from tcam_wsol_video_tpu.ops.interpolate import resize_bilinear, resize_nearest


def make_bilateral_features(image: jax.Array, sigma_rgb: float,
                            sigma_xy: Optional[float]) -> jax.Array:
    """image: (H, W, C) raw values in [0, 255].  Returns (H*W, D) features;
    D = C (+2 when sigma_xy given).  Matches initializePermutohedral
    (bilateralfilter.cpp:4-19): x index is the width coordinate."""
    h, w, c = image.shape
    feats = [image.reshape(h * w, c) / sigma_rgb]
    if sigma_xy is not None:
        xs = jnp.tile(jnp.arange(w, dtype=jnp.float32), (h,)).reshape(h * w, 1)
        ys = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w).reshape(h * w, 1)
        feats = [xs / sigma_xy, ys / sigma_xy] + feats
    return jnp.concatenate(feats, axis=1).astype(jnp.float32)


def _row_block(f_rows: jax.Array, f_all: jax.Array, v_all: jax.Array,
               sq_all: jax.Array) -> jax.Array:
    """Gaussian-attention for one tile of query pixels.
    f_rows: (R, D), f_all: (P, D), v_all: (P, K), sq_all: (P,).
    Returns (R, K)."""
    sq_rows = jnp.sum(f_rows * f_rows, axis=1, keepdims=True)      # (R, 1)
    # ||f||^2 reaches ~3k (rgb/15 at 255); the d2 cancellation needs full
    # fp32 accumulation — never let the MXU truncate this one to bf16
    dots = jnp.dot(f_rows, f_all.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)             # (R, P)
    d2 = sq_rows + sq_all[None, :] - 2.0 * dots
    wgt = jnp.exp(-0.5 * jnp.maximum(d2, 0.0))
    return jnp.dot(wgt, v_all, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)             # (R, K)


def gaussian_filter_apply(feats: jax.Array, vals: jax.Array,
                          row_block: int = 1024) -> jax.Array:
    """AS = exp(-||f_i - f_j||^2 / 2) @ vals, tiled over query rows.

    feats: (P, D), vals: (P, K) -> (P, K), all fp32.
    """
    p, d = feats.shape
    k = vals.shape[1]
    # pairwise distances are translation-invariant: center the features to
    # shrink ||f||^2 and keep the d2 cancellation well-conditioned
    feats = feats - jnp.mean(feats, axis=0, keepdims=True)
    sq_all = jnp.sum(feats * feats, axis=1)
    nblk = -(-p // row_block)
    pad = nblk * row_block - p
    f_pad = jnp.pad(feats, ((0, pad), (0, 0)))
    f_tiles = f_pad.reshape(nblk, row_block, d)
    out = lax.map(lambda fr: _row_block(fr, feats, vals, sq_all), f_tiles)
    return out.reshape(nblk * row_block, k)[:p]


_PALLAS_MAX_PIXELS = 60_000  # VMEM budget: inputs + scratch + (1024,1024) tiles


def _use_pallas(n_pixels: int) -> bool:
    return (jax.default_backend() == "tpu"
            and n_pixels <= _PALLAS_MAX_PIXELS)


def bilateral_filter_batch(images: jax.Array, segs: jax.Array,
                           sigma_rgb: float, sigma_xy: Optional[float],
                           row_block: int = 1024) -> jax.Array:
    """Batched exact bilateral filtering.

    images: (B, H, W, 3) in [0, 255]; segs: (B, H, W, K).
    sigma_xy=None selects the color-only kernel (the temporal joint CRF,
    colorbilateralfilter.cpp:4-18).  Returns AS with segs' shape.

    On TPU the batched Pallas kernel runs (VMEM-resident, no (R, P) tile
    materialization); elsewhere, or for images too large for VMEM
    residency, the portable XLA tiling runs.  Both are exp-bound at the
    same ~50 ms per 224^2 image (2.6e9 transcendentals); `scale_factor`
    is the sanctioned speed knob (13 ms at 0.5).
    """
    b, h, w, k = segs.shape
    pallas_ok = _use_pallas(h * w) and k <= 8

    if pallas_ok:
        from tcam_wsol_video_tpu.ops.pallas.bilateral import \
            gaussian_filter_apply_pallas_batched
        feats = jax.vmap(
            lambda img: make_bilateral_features(img, sigma_rgb, sigma_xy)
        )(images)                                        # (B, P, D)
        vals = segs.reshape(b, h * w, k).astype(jnp.float32)
        out = gaussian_filter_apply_pallas_batched(feats, vals)
        return out.reshape(b, h, w, k)

    def one(img, s):
        f = make_bilateral_features(img, sigma_rgb, sigma_xy)
        v = s.reshape(h * w, k).astype(jnp.float32)
        out = gaussian_filter_apply(f, v, row_block=row_block)
        return out.reshape(h, w, k)

    return jax.vmap(one)(images, segs)


# --------------------------------------------------------------------- loss
@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _crf_energy(images, segs, sigma_rgb, sigma_xy, row_block):
    as_ = bilateral_filter_batch(images, segs, sigma_rgb, sigma_xy,
                                 row_block=row_block)
    n = jnp.float32(segs.shape[0])
    return -jnp.sum(segs * as_) / n


def _crf_energy_fwd(images, segs, sigma_rgb, sigma_xy, row_block):
    as_ = bilateral_filter_batch(images, segs, sigma_rgb, sigma_xy,
                                 row_block=row_block)
    n = jnp.float32(segs.shape[0])
    loss = -jnp.sum(segs * as_) / n
    return loss, (as_, n)


def _crf_energy_bwd(sigma_rgb, sigma_xy, row_block, res, g):
    as_, n = res
    # reference backward: grad_s = -2 * g * AS / N (AS held constant,
    # dense_crf_loss.py:70-74; exact for symmetric W)
    return (None, -2.0 * g * as_ / n)


_crf_energy.defvjp(_crf_energy_fwd, _crf_energy_bwd)


def dense_crf_loss(images: jax.Array, segs: jax.Array, sigma_rgb: float,
                   sigma_xy: float, scale_factor: float = 1.0,
                   row_block: int = 1024) -> jax.Array:
    """Spatial+color CRF loss (reference DenseCRFLoss.forward,
    dense_crf_loss.py:95-123): image downscaled nearest, segs bilinear,
    sigma_xy scaled by the same factor.

    images: (B, H, W, 3) raw [0, 255]; segs: (B, H, W, K) softmaxed.
    """
    if scale_factor != 1.0:
        h = int(images.shape[1] * scale_factor)
        w = int(images.shape[2] * scale_factor)
        images = resize_nearest(images, (h, w))
        segs = resize_bilinear(segs, (h, w), align_corners=False)
    return _crf_energy(images.astype(jnp.float32), segs.astype(jnp.float32),
                       float(sigma_rgb), float(sigma_xy * scale_factor),
                       row_block)


def color_dense_crf_loss(images: jax.Array, segs: jax.Array, sigma_rgb: float,
                         scale_factor: float = 1.0,
                         row_block: int = 1024) -> jax.Array:
    """Color-only CRF loss (reference ColorDenseCRFLoss,
    color_dense_crf_loss.py:79-110) used by the temporal joint CRF where a
    clip's frames are concatenated along width."""
    if scale_factor != 1.0:
        h = int(images.shape[1] * scale_factor)
        w = int(images.shape[2] * scale_factor)
        images = resize_nearest(images, (h, w))
        segs = resize_bilinear(segs, (h, w), align_corners=False)
    return _crf_energy(images.astype(jnp.float32), segs.astype(jnp.float32),
                       float(sigma_rgb), None, row_block)
