"""Differentiable box -> foreground/background soft masks (C_BOX task).

Parity target: BoxStats (/root/reference/dlib/box/ops_box.py:15-191):
given raw box scores (x1, y1, x2, y2) scaled by scale_domain,
- validity: x2 > x1, y2 > y1, inside the image;
- area: (x2 - x1) * (y2 - y1);
- fg mask: product of relu'd signed distances to the four edges,
  normalized by the |.| product (1 inside the box, 0 outside, gradients
  flow through the box coordinates);
- bg mask: sum-form analogue that is 1 outside and 0 inside;
plus the gaussian-blur image compositing used for classifier scoring
(reference GaussianFiltering, train_wsol.py:329-332, 1358-1377).

NOTE on the reference coordinate quirk: its grids bind x to the HEIGHT
axis and y to the WIDTH axis (ops_box.py:30-44); we keep that behavior.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def box_validity(x: Array, y: Array, h: int, w: int) -> Array:
    """x, y: (B, 2) lo/hi pairs; 1 for geometrically valid boxes."""
    v = (x[:, 1] > x[:, 0]).astype(jnp.float32)
    v = v * (y[:, 1] > y[:, 0])
    v = v * (x[:, 0] >= 0) * (x[:, 1] < h)
    v = v * (y[:, 0] >= 0) * (y[:, 1] < w)
    return v


def box_area(x: Array, y: Array) -> Array:
    return (x[:, 1] - x[:, 0]) * (y[:, 1] - y[:, 0])


def _grids(h: int, w: int):
    gh = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    gw = jnp.ones((h, 1)) * jnp.arange(w, dtype=jnp.float32)[None, :]
    return gh, gw


def mask_fg(x: Array, y: Array, h: int, w: int) -> Array:
    """(B, 2), (B, 2) -> (B, h, w) soft inside-box mask."""
    gh, gw = _grids(h, w)
    x1 = gh[None] - x[:, 0, None, None]
    x2 = x[:, 1, None, None] - gh[None]
    y1 = gw[None] - y[:, 0, None, None]
    y2 = y[:, 1, None, None] - gw[None]
    delta = jnp.abs(x1) * jnp.abs(x2) * jnp.abs(y1) * jnp.abs(y2)
    phi = (jax.nn.relu(x1) * jax.nn.relu(x2) *
           jax.nn.relu(y1) * jax.nn.relu(y2))
    delta_d = jax.lax.stop_gradient(delta)
    return jnp.where(delta_d > 0, phi / jnp.where(delta_d > 0, delta_d, 1.0),
                     phi)


def mask_bg(x: Array, y: Array, h: int, w: int) -> Array:
    """(B, 2), (B, 2) -> (B, h, w) soft outside-box mask."""
    gh, gw = _grids(h, w)
    x1 = x[:, 0, None, None] - gh[None]
    x2 = gh[None] - x[:, 1, None, None]
    y1 = y[:, 0, None, None] - gw[None]
    y2 = gw[None] - y[:, 1, None, None]
    delta = ((x1 > 0) * jnp.abs(x1) + (x2 > 0) * jnp.abs(x2) +
             (y1 > 0) * jnp.abs(y1) + (y2 > 0) * jnp.abs(y2))
    psi = (jax.nn.relu(x1) + jax.nn.relu(x2) +
           jax.nn.relu(y1) + jax.nn.relu(y2))
    delta_d = jax.lax.stop_gradient(delta)
    return jnp.where(delta_d > 0, psi / jnp.where(delta_d > 0, delta_d, 1.0),
                     psi)


def box_stats(box: Array, h: int, w: int, scale_domain: float = 1.0,
              eval_mode: bool = False
              ) -> Tuple[Array, Array, Array, Array, Array, Array]:
    """box: (B, 4) raw scores (x1, y1, x2, y2).
    Returns (x, y, valid, area, mask_fg, mask_bg)."""
    x = jnp.stack([box[:, 0], box[:, 2]], axis=1) / scale_domain
    y = jnp.stack([box[:, 1], box[:, 3]], axis=1) / scale_domain
    if eval_mode:
        x = jnp.clip(x, 0.0, h - 1.0)
        y = jnp.clip(y, 0.0, w - 1.0)
    valid = box_validity(x, y, h, w)
    area = box_area(x, y)
    return x, y, valid, area, mask_fg(x, y, h, w), mask_bg(x, y, h, w)


def gaussian_blur(images: Array, ksize: int = 31, sigma: float = 16.0
                  ) -> Array:
    """Separable gaussian blur of (B, H, W, C) — the blurred-background
    composite source for C_BOX classifier scoring (reference
    GaussianFiltering with kornia, dlib/filtering/base.py)."""
    r = ksize // 2
    xs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    k = k / jnp.sum(k)
    # depthwise separable conv via two 1-D convolutions
    def conv1d(x, axis):
        kern = k.reshape((-1, 1) if axis == 1 else (1, -1))
        kern = kern[:, :, None, None]  # (kh, kw, 1, 1)
        b, h, w, c = x.shape
        xt = jnp.moveaxis(x, -1, 1).reshape(b * c, h, w, 1)
        pad = [(r, r), (0, 0)] if axis == 1 else [(0, 0), (r, r)]
        y = jax.lax.conv_general_dilated(
            xt, kern, (1, 1), [pad[0], pad[1]],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.moveaxis(y.reshape(b, c, h, w), 1, -1)
    return conv1d(conv1d(images, 1), 0)


def compose_fg_image(images: Array, blurred: Array, m_fg: Array,
                     m_bg: Array) -> Array:
    """fg-focused composite: mask_fg * image + mask_bg * blurred
    (reference train_wsol.py:1358-1366)."""
    return m_fg[..., None] * images + m_bg[..., None] * blurred


def compose_bg_image(images: Array, blurred: Array, m_fg: Array,
                     m_bg: Array) -> Array:
    return m_bg[..., None] * images + m_fg[..., None] * blurred
