"""Bilinear / nearest resizing as separable matmuls (MXU-friendly).

The reference leans on torch.nn.functional.interpolate with both
align_corners conventions (FCAM upsample align_corners=True,
/root/reference/dlib/base/model.py:143-148; eval cam resize
align_corners=False, /root/reference/dlib/learning/inference_wsol.py:342-346).
A TPU-native bilinear resize of NHWC tensors is two small dense matmuls
(H_out x H_in) and (W_in x W_out): XLA maps them straight onto the MXU and
fuses the surrounding elementwise work, instead of gather-based sampling.
The interpolation matrices are built at trace time (static shapes) so the
whole thing stays inside jit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _linear_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """Row r holds the source weights producing output sample r."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_out == 1:
        # torch convention: single output sample reads source 0 when
        # align_corners else the half-pixel mapped (clamped) source.
        if align_corners or n_in == 1:
            m[0, 0] = 1.0
            return m
    for r in range(n_out):
        if align_corners:
            src = r * (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
        else:
            src = (r + 0.5) * n_in / n_out - 0.5
            src = min(max(src, 0.0), n_in - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        w_hi = src - lo
        m[r, lo] += 1.0 - w_hi
        m[r, hi] += w_hi
    return m


@functools.lru_cache(maxsize=256)
def _nearest_matrix(n_in: int, n_out: int) -> np.ndarray:
    """torch 'nearest' convention: src = floor(r * n_in / n_out)."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    for r in range(n_out):
        src = min(int(r * n_in / n_out), n_in - 1)
        m[r, src] = 1.0
    return m


def _apply_separable(x: jax.Array, mh: np.ndarray, mw: np.ndarray) -> jax.Array:
    """x: (..., H, W, C) -> (..., H', W', C) via mh @ x @ mw^T."""
    a = jnp.asarray(mh, dtype=x.dtype)
    b = jnp.asarray(mw, dtype=x.dtype)
    # full-precision contractions: interpolation weights must not be
    # truncated to bf16 on the MXU
    hp = jax.lax.Precision.HIGHEST
    # contract H: (..., H, W, C), (H', H) -> (..., H', W, C)
    y = jnp.einsum("ph,...hwc->...pwc", a, x, precision=hp)
    y = jnp.einsum("qw,...pwc->...pqc", b, y, precision=hp)
    return y


def resize_bilinear(x: jax.Array, size, align_corners: bool = False) -> jax.Array:
    """Bilinear resize of (..., H, W, C) to (..., size[0], size[1], C),
    numerically matching torch.nn.functional.interpolate(mode='bilinear')."""
    h_out, w_out = int(size[0]), int(size[1])
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return x
    mh = _linear_matrix(h_in, h_out, align_corners)
    mw = _linear_matrix(w_in, w_out, align_corners)
    return _apply_separable(x, mh, mw)


def resize_nearest(x: jax.Array, size) -> jax.Array:
    """Nearest resize of (..., H, W, C), matching torch mode='nearest'."""
    h_out, w_out = int(size[0]), int(size[1])
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return x
    mh = _nearest_matrix(h_in, h_out)
    mw = _nearest_matrix(w_in, w_out)
    return _apply_separable(x, mh, mw)


def resize_nearest_then_bilinear(x: jax.Array, mid, size,
                                 align_corners: bool = True) -> jax.Array:
    """Fused nearest(in->mid) then bilinear(mid->size) resize.

    The U-Net decoder's snap path (reference decoder.py:14-45) nearest-
    upsamples 2x and then bilinear-resizes down to the skip resolution —
    at the stride-8 28x28 stages that materializes a (B, 56, 56, 2048)
    intermediate just to come straight back down.  Both resizes are
    separable linear maps, so their composition is one (out, in) matrix
    per axis: same math (up to fp reassociation — the composition is
    taken in fp64 numpy before casting), none of the 4x intermediate
    HBM traffic.
    """
    mid_h, mid_w = int(mid[0]), int(mid[1])
    h_out, w_out = int(size[0]), int(size[1])
    h_in, w_in = x.shape[-3], x.shape[-2]
    mh = (_linear_matrix(mid_h, h_out, align_corners).astype(np.float64)
          @ _nearest_matrix(h_in, mid_h).astype(np.float64)
          ).astype(np.float32)
    mw = (_linear_matrix(mid_w, w_out, align_corners).astype(np.float64)
          @ _nearest_matrix(w_in, mid_w).astype(np.float64)
          ).astype(np.float32)
    return _apply_separable(x, mh, mw)


def resize_hw(x: jax.Array, size, mode: str = "bilinear",
              align_corners: bool = False) -> jax.Array:
    """Resize a (..., H, W) map (no channel axis)."""
    y = x[..., None]
    if mode == "bilinear":
        y = resize_bilinear(y, size, align_corners=align_corners)
    elif mode == "nearest":
        y = resize_nearest(y, size)
    else:  # pragma: no cover
        raise ValueError(mode)
    return y[..., 0]
