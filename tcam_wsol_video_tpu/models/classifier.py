"""Standard classifier (task STD_CL) and DenseBoxNet (task C_BOX).

Parity targets:
- STDClassifier (/root/reference/dlib/stdcl/classifier.py:21-60 +
  base/model.py:20-102): encoder -> pooling head logits.
- DenseBoxNet (/root/reference/dlib/boxnet/core.py:21-76 +
  base/heads.py:75-106 BboxHead): encoder -> GAP -> Linear(4) raw box
  scores; downstream BoxStats turns them into valid boxes.

setup()-style modules so the classification head is addressable on its own
(`method="head_from_features"`): gradient CAM extractors differentiate the
head w.r.t. the feature map with jax.grad instead of the reference's
forward/backward hooks (/root/reference/dlib/cams/core.py:27-199).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tcam_wsol_video_tpu.models.poolings import build_pooling_head

Array = jax.Array


class STDClassifier(nn.Module):
    """Encoder + spatial pooling head.

    __call__ -> dict(cl_logits, cams_head, features).
    """
    encoder: nn.Module
    pooling: str
    classes: int
    support_background: bool = False
    scale_in: float = 1.0
    lse_r: float = 10.0
    wc_modalities: int = 5
    wc_kmax: float = 0.5
    wc_kmin: Optional[float] = None
    wc_alpha: float = 0.6
    wc_dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.classification_head = build_pooling_head(
            self.pooling, self.classes, self.support_background,
            r=self.lse_r, modalities=self.wc_modalities, kmax=self.wc_kmax,
            kmin=self.wc_kmin, alpha=self.wc_alpha, dropout=self.wc_dropout,
            dtype=self.dtype)

    def __call__(self, x: Array, train: bool = False) -> dict:
        features = self.encoder(x, train=train)
        cl_logits, cams_head = self.classification_head(features[-1],
                                                        train=train)
        return {
            "cl_logits": cl_logits,
            "cams_head": cams_head,
            "features": features,
        }

    def head_from_features(self, feat: Array, train: bool = False):
        """Apply only the pooling head — the hook point for gradient CAMs."""
        return self.classification_head(feat, train=train)


class DenseBoxNet(nn.Module):
    """Encoder + BboxHead predicting one raw (x1, y1, x2, y2)."""
    encoder: nn.Module
    freeze_encoder: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> dict:
        enc_train = train and not self.freeze_encoder
        features = self.encoder(x, train=enc_train)
        z = features[-1]
        if self.freeze_encoder:
            z = jax.lax.stop_gradient(z)
        z = jnp.mean(z, axis=(1, 2))
        box = nn.Dense(4, dtype=self.dtype, name="box_head")(z)
        return {"box": box, "features": features}
