"""CAM extraction as pure functions (no hooks).

Parity targets: the torch-cam-derived extractor family the reference
dispatches over (/root/reference/dlib/cams/__init__.py:53-117):
CAM (fc-weight), GradCAM, GradCAM++, SmoothGradCAM++, XGradCAM, LayerCAM
(gradient weighting, /root/reference/dlib/cams/gradcam.py), ScoreCAM /
SSCAM / ISCAM (masked-input score weighting,
/root/reference/dlib/cams/cam.py), BuiltinCam (pooling-head maps,
/root/reference/dlib/cams/builtincam.py:26-138), and the shared
weight-x-activation reduce + ReLU + min-max normalize
(/root/reference/dlib/cams/core.py:160-199).

TPU-native design: the model forward returns its feature maps, so
"hooking the target layer" is just reading features[-1]; gradient methods
differentiate the pooling head w.r.t. that feature map with jax.grad; every
method is batched (vmap over the batch) where the reference loops one
sample at a time through the model (inference_wsol.py:332-337).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tcam_wsol_video_tpu.core import constants
from tcam_wsol_video_tpu.ops.interpolate import resize_bilinear

Array = jax.Array

# head_fn(feat_nhwc) -> logits  (batched); feat (B, h, w, C)
HeadFn = Callable[[Array], Array]
# forward_fn(images) -> (logits, feats_last)
ForwardFn = Callable[[Array], tuple]


def normalize_minmax(cam: Array) -> Array:
    """Per-map min-max normalization (reference core.py:104-110)."""
    mn = jnp.min(cam, axis=(-2, -1), keepdims=True)
    mx = jnp.max(cam, axis=(-2, -1), keepdims=True)
    return (cam - mn) / (mx - mn)


def _finalize(cam: Array, relu: bool = True, normalized: bool = True) -> Array:
    cam = jnp.nan_to_num(cam, nan=0.0)
    if relu:
        cam = jax.nn.relu(cam)
    if normalized:
        cam = normalize_minmax(cam)
    return cam


def _weighted_cam(feats: Array, weights: Array, relu=True,
                  normalized=True) -> Array:
    """sum_k w_k A_k over channels. feats (B,h,w,C), weights (B,C) ->
    (B,h,w)."""
    cam = jnp.einsum("bhwc,bc->bhw", feats, weights)
    return _finalize(cam, relu, normalized)


# ----------------------------------------------------------------- CAM
def cam_fc_weights(feats: Array, fc_weight: Array, class_idx: Array,
                   support_background: bool = False,
                   normalized: bool = True) -> Array:
    """Classic CAM: weights = fc row of the target class
    (reference cams/cam.py CAM; WGAP head).  fc_weight: (C, classes) in
    flax layout.  class_idx: (B,) int."""
    idx = class_idx + (1 if support_background else 0)
    w = fc_weight.T[idx]                       # (B, C)
    return _weighted_cam(feats, w, relu=True, normalized=normalized)


def builtin_cam(cams_head: Array, class_idx: Array,
                support_background: bool = False,
                normalized: bool = True) -> Array:
    """Heads with per-class maps (GAP/MaxPool/LSE/WildCat): read map at
    class_idx (+1 with background support) — reference
    builtincam.py:26-138."""
    idx = class_idx + (1 if support_background else 0)
    # one-hot contraction over the class axis: a minor-axis gather
    # serializes on TPU; this is one small VPU/MXU contraction
    oh = jax.nn.one_hot(idx, cams_head.shape[-1], dtype=cams_head.dtype)
    cam = jnp.einsum("bhwk,bk->bhw", cams_head, oh)
    return _finalize(cam, relu=True, normalized=normalized)


# ------------------------------------------------------------ grad CAMs
def _class_grads(head_fn: HeadFn, feats: Array, class_idx: Array) -> Array:
    """d logits[class] / d feats, per sample, one vjp for the batch."""
    def scalar(f):
        logits = head_fn(f)
        oh = jax.nn.one_hot(class_idx, logits.shape[-1], dtype=logits.dtype)
        return jnp.sum(logits * oh)
    return jax.grad(scalar)(feats)


def grad_cam(head_fn: HeadFn, feats: Array, class_idx: Array,
             normalized: bool = True) -> Array:
    """GradCAM: w_k = GAP of gradients (reference gradcam.py:122-129)."""
    g = _class_grads(head_fn, feats, class_idx)
    w = jnp.mean(g, axis=(1, 2))
    return _weighted_cam(feats, w, normalized=normalized)


def grad_cam_pp(head_fn: HeadFn, feats: Array, class_idx: Array,
                normalized: bool = True) -> Array:
    """GradCAM++ (reference gradcam.py:179-199): alpha = g^2 / (2 g^2 +
    sum(A g^3)), w_k = sum(alpha * relu(g))."""
    g = _class_grads(head_fn, feats, class_idx)
    g2 = g * g
    g3 = g2 * g
    denom = 2.0 * g2 + jnp.sum(g3 * feats, axis=(1, 2), keepdims=True)
    alpha = jnp.where(g2 > 0, g2 / jnp.where(denom == 0, 1.0, denom), 0.0)
    w = jnp.sum(alpha * jax.nn.relu(g), axis=(1, 2))
    return _weighted_cam(feats, w, normalized=normalized)


def smooth_grad_cam_pp(forward_feats_fn: Callable[[Array], Array],
                       head_fn: HeadFn, images: Array, class_idx: Array,
                       key: jax.Array, num_samples: int = 4,
                       std: float = 0.3, normalized: bool = True) -> Array:
    """SmoothGradCAM++ (reference gradcam.py:266-342): gradient moments
    averaged over noisy inputs; activations from the clean input."""
    feats0 = forward_feats_fn(images)

    def one(k):
        noisy = images + std * jax.random.normal(k, images.shape,
                                                 images.dtype)
        f = forward_feats_fn(noisy)
        g = _class_grads(head_fn, f, class_idx)
        return g * g, g * g * g, g

    keys = jax.random.split(key, num_samples)
    g2s, g3s, gs = jax.vmap(one)(keys)
    g2 = jnp.mean(g2s, axis=0)
    g3 = jnp.mean(g3s, axis=0)
    g_last = gs[-1]
    denom = 2.0 * g2 + jnp.sum(g3 * feats0, axis=(1, 2), keepdims=True)
    alpha = jnp.where(denom != 0, g2 / jnp.where(denom == 0, 1.0, denom), 0.0)
    w = jnp.sum(alpha * jax.nn.relu(g_last), axis=(1, 2))
    return _weighted_cam(feats0, w, normalized=normalized)


def xgrad_cam(head_fn: HeadFn, feats: Array, class_idx: Array,
              normalized: bool = True) -> Array:
    """XGradCAM (reference gradcam.py:381-390): w_k = sum(g*A)/sum(A)."""
    g = _class_grads(head_fn, feats, class_idx)
    num = jnp.sum(g * feats, axis=(1, 2))
    den = jnp.sum(feats, axis=(1, 2))
    w = num / jnp.where(den == 0, 1.0, den)
    return _weighted_cam(feats, w, normalized=normalized)


def layer_cam(head_fn: HeadFn, feats: Array, class_idx: Array,
              normalized: bool = True) -> Array:
    """LayerCAM: cam = relu(sum_k relu(g_k) * A_k) (reference
    gradcam.py:393+)."""
    g = _class_grads(head_fn, feats, class_idx)
    cam = jnp.sum(jax.nn.relu(g) * feats, axis=-1)
    return _finalize(cam, relu=True, normalized=normalized)


# ---------------------------------------------------------- score CAMs
def score_cam(forward_logits_fn: Callable[[Array], Array], images: Array,
              feats: Array, class_idx: Array, batch_chunk: int = 32,
              normalized: bool = True) -> Array:
    """ScoreCAM (reference cams/cam.py ScoreCAM): mask the input with each
    normalized upsampled activation channel, re-score, weights =
    softmax over channels of the class score.  Channels are scored in
    chunks through one batched forward instead of the reference's
    per-channel loop."""
    b, h, w, c = feats.shape
    hh, ww = images.shape[1:3]
    ups = resize_bilinear(feats, (hh, ww), align_corners=False)  # (B,H,W,C)
    mn = jnp.min(ups, axis=(1, 2), keepdims=True)
    mx = jnp.max(ups, axis=(1, 2), keepdims=True)
    masks = (ups - mn) / jnp.where(mx - mn == 0, 1.0, mx - mn)

    def score_chunk(chunk_idx):
        sl = jax.lax.dynamic_slice_in_dim(masks, chunk_idx * batch_chunk,
                                          batch_chunk, axis=3)
        # (B, H, W, chunk) -> (B*chunk, H, W, 3)
        m = jnp.transpose(sl, (0, 3, 1, 2))[..., None]      # B,chunk,H,W,1
        masked = images[:, None] * m                         # B,chunk,H,W,3
        flat = masked.reshape((-1,) + images.shape[1:])
        logits = forward_logits_fn(flat)                     # (B*chunk, K)
        logits = logits.reshape(b, batch_chunk, -1)
        oh = jax.nn.one_hot(class_idx, logits.shape[-1], dtype=logits.dtype)
        return jnp.sum(logits * oh[:, None, :], axis=-1)     # (B, chunk)

    nchunks = c // batch_chunk
    assert nchunks * batch_chunk == c, (c, batch_chunk)
    scores = jax.lax.map(score_chunk, jnp.arange(nchunks))   # (n, B, chunk)
    scores = jnp.transpose(scores, (1, 0, 2)).reshape(b, c)
    wgt = jax.nn.softmax(scores, axis=-1)
    return _weighted_cam(feats, wgt, normalized=normalized)


def sscam(forward_logits_fn, images, feats, class_idx, key,
          num_samples: int = 4, std: float = 2.0, batch_chunk: int = 32,
          normalized: bool = True) -> Array:
    """Smoothed ScoreCAM: noise added to the masked input, scores averaged
    (reference cams/cam.py SSCAM)."""
    def one(k):
        noisy = images + std * jax.random.normal(k, images.shape,
                                                 images.dtype)
        return score_cam(forward_logits_fn, noisy, feats, class_idx,
                         batch_chunk=batch_chunk, normalized=False)
    keys = jax.random.split(key, num_samples)
    cams = jnp.mean(jax.vmap(one)(keys), axis=0)
    return _finalize(cams, relu=False, normalized=normalized)


def iscam(forward_logits_fn, images, feats, class_idx,
          num_samples: int = 4, batch_chunk: int = 32,
          normalized: bool = True) -> Array:
    """Integrated ScoreCAM: scores averaged over linearly scaled masks
    (reference cams/cam.py ISCAM)."""
    def one(i):
        scaled = images * ((i + 1.0) / num_samples)
        return score_cam(forward_logits_fn, scaled, feats, class_idx,
                         batch_chunk=batch_chunk, normalized=False)
    cams = jnp.mean(jax.vmap(one)(jnp.arange(num_samples, dtype=jnp.float32)),
                    axis=0)
    return _finalize(cams, relu=False, normalized=normalized)


# ----------------------------------------------------------- seg extractor
def seg_cam(fcams: Array, argmax: bool = False) -> Array:
    """FCAM/TCAM eval extractor: softmax foreground channel (or argmax
    binary map) of the 2-channel decoder output — reference
    builtincam.py:202-225.  fcams: (B, H, W, 2) -> (B, H, W)."""
    if argmax:
        return jnp.argmax(fcams, axis=-1).astype(jnp.float32)
    return jax.nn.softmax(fcams, axis=-1)[..., 1]


# ------------------------------------------------------------- dispatch
def build_std_extractor(method: str):
    """Map a reference method name to the extractor function; mirrors
    build_std_cam_extractor dispatch (cams/__init__.py:53-117)."""
    table = {
        constants.METHOD_CAM: cam_fc_weights,
        constants.METHOD_GRADCAM: grad_cam,
        constants.METHOD_GRADCAMPP: grad_cam_pp,
        constants.METHOD_SMOOTHGRADCAMPP: smooth_grad_cam_pp,
        constants.METHOD_XGRADCAM: xgrad_cam,
        constants.METHOD_LAYERCAM: layer_cam,
        constants.METHOD_SCORECAM: score_cam,
        constants.METHOD_SSCAM: sscam,
        constants.METHOD_ISCAM: iscam,
        constants.METHOD_GAP: builtin_cam,
        constants.METHOD_MAXPOOL: builtin_cam,
        constants.METHOD_LSE: builtin_cam,
        constants.METHOD_WILDCAT: builtin_cam,
    }
    return table[method]
