"""Inference-time dense-CRF refinement (mean-field), fully on device.

Parity target: the reference's DenseCRFFilter wraps pydensecrf for
optional CAM refinement at inference (/root/reference/dlib/crf/
crf_post_processing.py:33+; available but off the main path).  Here the
mean-field loop runs on the TPU using the same exact Gaussian-attention
bilateral filter as the CRF loss:

    Q0 = softmax(-U);  repeat T times:
        m  = w_app * W_bilateral Q + w_smooth * W_spatial Q
        Q  = softmax(-U + m)          (Potts compatibility, mu = -1)

(Krahenbuhl & Koltun 2011, eq. 4-6; message excludes self-connection by
subtracting the identity term W_ii = 1.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tcam_wsol_video_tpu.ops.crf import bilateral_filter_batch

Array = jax.Array


@partial(jax.jit, static_argnames=("num_iters", "sigma_rgb", "sigma_xy",
                                   "sigma_smooth", "w_app", "w_smooth"))
def mean_field_refine(images: Array, probs: Array, num_iters: int = 5,
                      sigma_rgb: float = 13.0, sigma_xy: float = 80.0,
                      sigma_smooth: float = 3.0, w_app: float = 10.0,
                      w_smooth: float = 3.0) -> Array:
    """images: (B, H, W, 3) raw [0,255]; probs: (B, H, W, K) initial
    class probabilities (e.g. softmaxed FCAMs).  Returns refined probs."""
    unary = -jnp.log(jnp.maximum(probs, 1e-8))

    def step(q, _):
        app = bilateral_filter_batch(images, q, sigma_rgb, sigma_xy)
        smooth = bilateral_filter_batch(
            jnp.zeros_like(images), q, 1.0, sigma_smooth)
        # remove self-connections (W_ii = 1 in both kernels)
        msg = w_app * (app - q) + w_smooth * (smooth - q)
        q_new = jax.nn.softmax(-unary + msg, axis=-1)
        return q_new, None

    q, _ = jax.lax.scan(step, jax.nn.softmax(-unary, axis=-1), None,
                        length=num_iters)
    return q
