"""Temporal CAM aggregation + heating schedule.

Parity targets:
- exponential "overheating" renormalization exp(cam*t)/max with nan guards
  (/root/reference/dlib/datasets/wsol_loader.py:629-635 re_normalize_cam);
- elementwise max fusion over the +-knn neighbor frames' CAMs
  (wsol_loader.py:585-601);
- the DecayTemp epoch schedule that anneals the heat t toward a minimum and
  switches the seed technique to uniform at a given epoch
  (/root/reference/dlib/cams/decay_temp.py:20-98).

TPU-native: fusion is one vectorized op over (B, T, H, W) stacks with a
validity mask (shots near boundaries have fewer neighbors -> padded), so
the whole clip fuses inside jit instead of a python loop per frame.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tcam_wsol_video_tpu.core import constants

Array = jax.Array


def heat_cam(cam: Array, t: float | Array) -> Array:
    """exp((cam + 1e-6) * t) / max, nan/posinf guarded."""
    e = jnp.exp((cam + 1e-6) * t)
    e = e / jnp.max(e, axis=(-2, -1), keepdims=True)
    return jnp.nan_to_num(e, nan=0.0, posinf=1.0, neginf=0.0)


def fuse_temporal_max(cams: Array, valid: Array, t: float | Array = 0.0
                      ) -> Array:
    """cams: (B, T, H, W) neighbor stacks, valid: (B, T) bool mask.
    Heats each valid frame's CAM (when t > 0) then max-fuses over T."""
    def heated(c):
        return jnp.where(t > 0, heat_cam(c, jnp.maximum(t, 1e-12)), c)
    h = heated(cams)
    h = jnp.where(valid[..., None, None], h, -jnp.inf)
    out = jnp.max(h, axis=1)
    # all-invalid rows (cannot happen for the center frame) -> zeros
    return jnp.where(jnp.isfinite(out), out, 0.0)


@dataclass
class DecayTemp:
    """Epoch schedule for the heating factor + seed technique
    (reference decay_temp.py:20-98).  Pure dataclass: the trainer sets
    `epoch`, the dataset reads the properties."""
    sl_tc_knn_t: float
    sl_tc_min_t: float
    sl_tc_knn: int
    sl_tc_knn_mode: str
    sl_tc_knn_epoch_switch_uniform: int
    sl_tc_seed_tech: str
    epoch: int = 0

    def __post_init__(self):
        assert self.sl_tc_knn_t >= self.sl_tc_min_t
        assert self.sl_tc_knn_mode in constants.TIME_DEPENDENCY
        assert self.sl_tc_seed_tech in constants.SEED_TECHS
        sw = self.sl_tc_knn_epoch_switch_uniform
        self.decayable = sw != -1
        if self.decayable and sw > 0:
            self.decay = (self.sl_tc_knn_t - self.sl_tc_min_t) / float(sw)
        else:
            self.decay = 0.0

    @property
    def t(self) -> float:
        if not self.decayable:
            return self.sl_tc_knn_t
        return max(self.sl_tc_min_t, self.sl_tc_knn_t - self.epoch * self.decay)

    @property
    def seed_tech(self) -> str:
        if (self.decayable and
                self.epoch >= self.sl_tc_knn_epoch_switch_uniform):
            return constants.SEED_UNIFORM
        return self.sl_tc_seed_tech

    def set_epoch(self, epoch: int) -> None:
        assert epoch >= 0
        self.epoch = int(epoch)
