"""CAM extraction as pure functions (no hooks).

Parity targets: the torch-cam-derived extractor family the reference
dispatches over (/root/reference/dlib/cams/__init__.py:53-117):
CAM (fc-weight), GradCAM, GradCAM++, SmoothGradCAM++, XGradCAM, LayerCAM
(gradient weighting, /root/reference/dlib/cams/gradcam.py), ScoreCAM /
SSCAM / ISCAM (masked-input score weighting,
/root/reference/dlib/cams/cam.py), BuiltinCam (pooling-head maps,
/root/reference/dlib/cams/builtincam.py:26-138), and the shared
weight-x-activation nansum reduce + optional ReLU + min-max normalize
(/root/reference/dlib/cams/core.py:160-199).

Every method's VALUES are pinned to the reference's own classes under
identical weights/inputs/noise by tests/test_golden_cams.py, including
the reference's quirks: classic CAM and BuiltinCam apply NO ReLU before
normalization (core.py:76 `_relu=False`, never overridden by CAM /
BuiltinCam); GradCAM++'s alpha division is a no-op (see grad_cam_pp);
SmoothGradCAM++'s weighted combination uses the activations of the LAST
noisy forward; ScoreCAM-family weights are per-mask softmax CLASS
probabilities, not a cross-channel softmax, with activations normalized
at feature resolution BEFORE upsampling.

TPU-native design: the model forward returns its feature maps, so
"hooking the target layer" is just reading features[-1]; gradient methods
differentiate the pooling head w.r.t. that feature map with jax.grad; every
method is batched (vmap over the batch) where the reference loops one
sample at a time through the model (inference_wsol.py:332-337).
"""
from __future__ import annotations

from typing import Callable, Optional

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
    """Reference finishing order: optional ReLU (core.py:185-187), min-max
    normalize (core.py:190-192), then the eval pipeline's nan quick-fix
    (inference_wsol.py:318-323: nan -> 0, +inf -> 1, -inf -> 0)."""
    if relu:
        cam = jax.nn.relu(cam)
    if normalized:
        cam = normalize_minmax(cam)
    return jnp.nan_to_num(cam, nan=0.0, posinf=1.0, neginf=0.0)


def _weighted_cam(feats: Array, weights: Array, relu=True,
                  normalized=True) -> Array:
    """sum_k w_k A_k over channels via torch.nansum semantics
    (core.py:183): a NaN weight drops its channel's contribution.
    feats (B,h,w,C), weights (B,C) -> (B,h,w)."""
    weights = jnp.where(jnp.isnan(weights), 0.0, weights)
    cam = jnp.einsum("bhwc,bc->bhw", feats, weights)
    return _finalize(cam, relu, normalized)


# ----------------------------------------------------------------- CAM
def cam_fc_weights(feats: Array, fc_weight: Array, class_idx: Array,
                   support_background: bool = False,
                   normalized: bool = True, relu: bool = False) -> Array:
    """Classic CAM: weights = fc row of the target class
    (reference cams/cam.py:31-101; WGAP head).  fc_weight: (C, classes) in
    flax layout.  class_idx: (B,) int.

    NO ReLU before normalization: `CAM` never overrides `_CAM._relu`,
    which defaults to False (core.py:76) — negative-sum regions scale
    into [0, 1] instead of clamping to 0 (pinned by test_golden_cams)."""
    idx = class_idx + (1 if support_background else 0)
    w = fc_weight.T[idx]                       # (B, C)
    return _weighted_cam(feats, w, relu=relu, normalized=normalized)


def builtin_cam(cams_head: Array, class_idx: Array,
                support_background: bool = False,
                normalized: bool = True, relu: bool = False) -> Array:
    """Heads with per-class maps (GAP/MaxPool/LSE/WildCat): read map at
    class_idx (+1 with background support) — reference
    builtincam.py:108-130: index + min-max normalize, NO ReLU."""
    idx = class_idx + (1 if support_background else 0)
    # one-hot contraction over the class axis: a minor-axis gather
    # serializes on TPU; this is one small VPU/MXU contraction
    oh = jax.nn.one_hot(idx, cams_head.shape[-1], dtype=cams_head.dtype)
    cam = jnp.einsum("bhwk,bk->bhw", cams_head, oh)
    return _finalize(cam, relu=relu, normalized=normalized)


# ------------------------------------------------------------ grad CAMs
def _class_grads(head_fn: HeadFn, feats: Array, class_idx: Array) -> Array:
    """d logits[class] / d feats, per sample, one vjp for the batch
    (reference _backprop, gradcam.py:66-76)."""
    def scalar(f):
        logits = head_fn(f)
        oh = jax.nn.one_hot(class_idx, logits.shape[-1], dtype=logits.dtype)
        return jnp.sum(logits * oh)
    return jax.grad(scalar)(feats)


def grad_cam(head_fn: HeadFn, feats: Array, class_idx: Array,
             normalized: bool = True) -> Array:
    """GradCAM: w_k = GAP of gradients (reference gradcam.py:122-129);
    ReLU before normalize (_GradCAM._relu=True, gradcam.py:48)."""
    g = _class_grads(head_fn, feats, class_idx)
    w = jnp.mean(g, axis=(1, 2))
    return _weighted_cam(feats, w, normalized=normalized)


def grad_cam_pp(head_fn: HeadFn, feats: Array, class_idx: Array,
                normalized: bool = True,
                corrected_alpha: bool = False) -> Array:
    """GradCAM++ (reference gradcam.py:183-199).

    The reference sets `alpha = grad_2` and then
    `alpha[nan_mask].div_(denom[nan_mask])` — boolean advanced indexing
    returns a COPY, so the in-place divide never reaches `alpha` and the
    shipped weights are w_k = sum(g^2 * relu(g)) (an upstream torch-cam
    bug the reference's results were produced with; pinned by
    test_golden_cams).  Default replicates that behavior;
    `corrected_alpha=True` applies the paper's
    alpha = g^2 / (2 g^2 + sum(A g^3))."""
    g = _class_grads(head_fn, feats, class_idx)
    g2 = g * g
    if corrected_alpha:
        denom = 2.0 * g2 + jnp.sum(g2 * g * feats, axis=(1, 2),
                                   keepdims=True)
        alpha = jnp.where(g2 > 0, g2 / jnp.where(denom == 0, 1.0, denom),
                          0.0)
    else:
        alpha = g2
    w = jnp.sum(alpha * jax.nn.relu(g), axis=(1, 2))
    return _weighted_cam(feats, w, normalized=normalized)


def smooth_grad_cam_pp(forward_feats_fn: Callable[[Array], Array],
                       head_fn: HeadFn, images: Array, class_idx: Array,
                       key: jax.Array, num_samples: int = 4,
                       std: float = 0.3, normalized: bool = True,
                       noise: Optional[Array] = None) -> Array:
    """SmoothGradCAM++ (reference gradcam.py:266-342): N noisy forwards
    accumulate g^2 / g^3 estimates; alpha = mean(g^2) / (2 mean(g^2) +
    sum_hw(mean(g^3) * A_clean)) — the denominator uses the CLEAN
    activations captured before the loop (init_fmap, gradcam.py:306) —
    while relu(g) uses the LAST noisy gradient and the weighted
    combination uses the LAST noisy forward's activations (hook_a stays
    live through the loop).  0/0 alphas are dropped by torch.nansum
    (here: zeroed).  `noise`: optional (num_samples, *images.shape)
    override so parity tests can replay the reference's exact draws;
    otherwise drawn from `key`."""
    feats0 = forward_feats_fn(images)
    if noise is None:
        noise = std * jax.random.normal(key, (num_samples,) + images.shape,
                                        images.dtype)

    def one(n):
        f = forward_feats_fn(images + n)
        g = _class_grads(head_fn, f, class_idx)
        return g * g, g * g * g, g, f

    g2s, g3s, gs, fs = jax.vmap(one)(noise)
    g2 = jnp.mean(g2s, axis=0)
    g3 = jnp.mean(g3s, axis=0)
    g_last = gs[-1]
    feats_last = fs[-1]
    denom = 2.0 * g2 + jnp.sum(g3 * feats0, axis=(1, 2), keepdims=True)
    alpha = jnp.where(denom != 0, g2 / jnp.where(denom == 0, 1.0, denom), 0.0)
    w = jnp.sum(alpha * jax.nn.relu(g_last), axis=(1, 2))
    return _weighted_cam(feats_last, w, normalized=normalized)


def xgrad_cam(head_fn: HeadFn, feats: Array, class_idx: Array,
              normalized: bool = True) -> Array:
    """XGradCAM (reference gradcam.py:386-396): w_k = sum(g*A)/sum(A).
    The reference has no zero guard — a zero-sum channel yields a NaN
    weight that torch.nansum then drops; here the weight is zeroed
    directly (same contribution)."""
    g = _class_grads(head_fn, feats, class_idx)
    num = jnp.sum(g * feats, axis=(1, 2))
    den = jnp.sum(feats, axis=(1, 2))
    w = jnp.where(den == 0, 0.0, num / jnp.where(den == 0, 1.0, den))
    return _weighted_cam(feats, w, normalized=normalized)


def layer_cam(head_fn: HeadFn, feats: Array, class_idx: Array,
              normalized: bool = True) -> Array:
    """LayerCAM: cam = relu(sum_k relu(g_k) * A_k) (reference
    gradcam.py:397-444: spatial weights relu(g))."""
    g = _class_grads(head_fn, feats, class_idx)
    cam = jnp.sum(jax.nn.relu(g) * feats, axis=-1)
    return _finalize(cam, relu=True, normalized=normalized)


# ---------------------------------------------------------- score CAMs
def _upsampled_masks(feats: Array, images: Array):
    """ScoreCAM-family mask construction (cam.py:176-193): per-channel
    min-max normalize at FEATURE resolution (core.py:104-110 with
    spatial_dims=2), THEN bilinear align_corners=False upsample to the
    input size — the order matters because upsampling does not preserve
    per-channel extrema.

    Reference quirk pinned by test_golden_cams: `_normalize`'s
    sub_/div_ MUTATE hook_a in place (cam.py:178-180 via
    core.py:104-110), so the final weighted combination (core.py:183)
    runs over the NORMALIZED activations, not the raw ones — hence
    masks_feat is returned for the weighting too.

    Returns masks_feat (B, h, w, C) normalized feature maps, masks
    (B, C, H, W, 1) ready to multiply NHWC images, and a (B, C) flag
    marking zero-range channels (the reference's 0/0 there propagates
    NaN through the forward and torch.nansum drops the channel; callers
    zero those weights)."""
    hh, ww = images.shape[1:3]
    mn = jnp.min(feats, axis=(1, 2), keepdims=True)
    mx = jnp.max(feats, axis=(1, 2), keepdims=True)
    zero_rng = (mx - mn) == 0                                # (B,1,1,C)
    masks_feat = (feats - mn) / jnp.where(zero_rng, 1.0, mx - mn)
    ups = resize_bilinear(masks_feat, (hh, ww), align_corners=False)
    masks_t = jnp.transpose(ups, (0, 3, 1, 2))[..., None]    # (B,C,H,W,1)
    return (masks_feat, masks_t,
            zero_rng.reshape(feats.shape[0], feats.shape[-1]))


def _class_probs_chunked(forward_logits_fn: Callable[[Array], Array],
                         masks_t: Array, images: Array, class_idx: Array,
                         batch_chunk: int, noise: Optional[Array] = None,
                         scale=1.0) -> Array:
    """Per-(sample, channel) target-class softmax probability of the
    masked input (cam.py:203-215 chunk loop): weights are
    softmax(model(masked))[:, class] — per-mask CLASS probabilities, no
    cross-channel softmax.  masks_t (B, C, H, W, 1); noise optional
    (B, H, W, 3) added to the MASK (SSCAM, cam.py:330-333:
    input * (mask + delta)); scale multiplies the masked input (ISCAM's
    accumulated fmap coefficient).  Channels are scored `batch_chunk` at
    a time through one batched forward instead of the reference's
    per-channel loop."""
    b, c = masks_t.shape[:2]
    nchunks = c // batch_chunk
    assert nchunks * batch_chunk == c, (c, batch_chunk)

    def score_chunk(chunk_idx):
        m = jax.lax.dynamic_slice_in_dim(masks_t, chunk_idx * batch_chunk,
                                         batch_chunk, axis=1)
        if noise is not None:
            m = m + noise[:, None]
        masked = scale * (images[:, None] * m)               # B,chunk,H,W,3
        flat = masked.reshape((-1,) + images.shape[1:])
        probs = jax.nn.softmax(forward_logits_fn(flat), axis=-1)
        probs = probs.reshape(b, batch_chunk, -1)
        oh = jax.nn.one_hot(class_idx, probs.shape[-1], dtype=probs.dtype)
        return jnp.sum(probs * oh[:, None, :], axis=-1)      # (B, chunk)

    scores = jax.lax.map(score_chunk, jnp.arange(nchunks))   # (n, B, chunk)
    return jnp.transpose(scores, (1, 0, 2)).reshape(b, c)


def score_cam(forward_logits_fn: Callable[[Array], Array], images: Array,
              feats: Array, class_idx: Array, batch_chunk: int = 32,
              normalized: bool = True) -> Array:
    """ScoreCAM (reference cam.py:102-222): mask the input with each
    normalized upsampled activation channel, re-score, weight each
    channel by the target class's softmax PROBABILITY of its masked
    input; ReLU before normalize (_relu=True, cam.py:165).  The weighted
    sum runs over the NORMALIZED activations (see _upsampled_masks)."""
    masks_feat, masks_t, zero_rng = _upsampled_masks(feats, images)
    w = _class_probs_chunked(forward_logits_fn, masks_t, images, class_idx,
                             batch_chunk)
    w = jnp.where(zero_rng, 0.0, w)
    return _weighted_cam(masks_feat, w, normalized=normalized)


def sscam(forward_logits_fn, images, feats, class_idx, key,
          num_samples: int = 35, std: float = 2.0, batch_chunk: int = 32,
          normalized: bool = True, noise: Optional[Array] = None) -> Array:
    """Smoothed ScoreCAM (reference cam.py:225-355): noise is added to
    the MASK — masked = input * (mask + delta), delta one field per
    sample shared across channels (cam.py:330-333) — and the class
    probabilities are averaged over num_samples (default 35, std 2.0,
    cam.py:293-295).  `noise`: optional (num_samples, *images.shape)
    override for parity tests; otherwise drawn from `key`."""
    masks_feat, masks_t, zero_rng = _upsampled_masks(feats, images)
    if noise is None:
        noise = std * jax.random.normal(key, (num_samples,) + images.shape,
                                        images.dtype)

    def one(n):
        return _class_probs_chunked(forward_logits_fn, masks_t, images,
                                    class_idx, batch_chunk, noise=n)

    w = jnp.mean(jax.lax.map(one, noise), axis=0)
    w = jnp.where(zero_rng, 0.0, w)
    return _weighted_cam(masks_feat, w, normalized=normalized)


def iscam(forward_logits_fn, images, feats, class_idx,
          num_samples: int = 10, batch_chunk: int = 32,
          normalized: bool = True) -> Array:
    """Integrated ScoreCAM (reference cam.py:358-475): the masked input
    ACCUMULATES across samples — fmap += (i+1)/N * input * mask
    (cam.py:456), so sample i scores fmap_i = input * mask *
    sum_{j<=i}(j+1)/N — and the weights are the SUM (not mean) of the
    class probabilities (cam.py:461-467)."""
    masks_feat, masks_t, zero_rng = _upsampled_masks(feats, images)
    coefs = jnp.cumsum((jnp.arange(num_samples, dtype=images.dtype) + 1.0)
                       / num_samples)

    def one(c):
        return _class_probs_chunked(forward_logits_fn, masks_t, images,
                                    class_idx, batch_chunk, scale=c)

    w = jnp.sum(jax.lax.map(one, coefs), axis=0)
    w = jnp.where(zero_rng, 0.0, w)
    return _weighted_cam(masks_feat, w, normalized=normalized)


# ----------------------------------------------------------- seg extractor
def seg_cam(fcams: Array, argmax: bool = False) -> Array:
    """FCAM/TCAM eval extractor: softmax foreground channel (or argmax
    binary map) of the 2-channel decoder output — reference
    builtincam.py:201-225.  fcams: (B, H, W, 2) -> (B, H, W)."""
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
