"""Binary/grayscale morphology as reduce-window ops.

The reference uses kornia dilation/erosion with all-ones square kernels to
grow seed points and clean foreground ROIs
(/root/reference/dlib/cams/tcam_seeding.py:143-186,
fcam_seeding.py:224-390).  With a flat structuring element those are just
max- and min-pools — `lax.reduce_window` compiles to native TPU vector ops
and vectorizes over the batch for free (the reference loops per sample).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _window(x: jax.Array, k: int, init, op) -> jax.Array:
    """(..., H, W) reduce-window with SAME padding over the last two axes."""
    nd = x.ndim
    dims = [1] * nd
    strides = [1] * nd
    dims[-2] = dims[-1] = k
    pad = [(0, 0)] * (nd - 2) + [((k - 1) // 2, k // 2), ((k - 1) // 2, k // 2)]
    return lax.reduce_window(x, init, op, dims, strides, pad)


def dilate(x: jax.Array, ksize: int) -> jax.Array:
    """Grayscale/binary dilation with a flat ksize x ksize kernel.
    x: (..., H, W) float or int."""
    if ksize <= 1:
        return x
    if jnp.issubdtype(x.dtype, jnp.integer):
        info = jnp.iinfo(x.dtype)
        return _window(x, ksize, info.min, lax.max)
    return _window(x, ksize, -jnp.inf, lax.max)


def erode(x: jax.Array, ksize: int, iterations: int = 1) -> jax.Array:
    """Grayscale/binary erosion with a flat ksize x ksize kernel."""
    if ksize <= 1 or iterations <= 0:
        return x
    out = x
    for _ in range(iterations):
        if jnp.issubdtype(out.dtype, jnp.integer):
            info = jnp.iinfo(out.dtype)
            out = _window(out, ksize, info.max, lax.min)
        else:
            out = _window(out, ksize, jnp.inf, lax.min)
    return out
