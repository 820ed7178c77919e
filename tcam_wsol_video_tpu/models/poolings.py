"""Spatial pooling / classification heads (flax linen, NHWC).

Parity targets (/root/reference/dlib/poolings/core.py:71-174, wildcat.py):
GAP (1x1 conv -> avgpool), WGAP (avgpool -> fc; the CAM-paper head,
builtin_cam=False), MaxPool, LogSumExpPool, WildCatCLHead
(class-wise modality pooling + kmax/kmin decision).

TPU-native differences: heads return (logits, cams) explicitly instead of
caching `self.cams` module state; `support_background` adds one map/logit
and drops logit 0 from the returned logits (reference core.py:53-57) but
keeps it in the cams.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class GAP(nn.Module):
    """1x1 conv to class maps, then global average pooling."""
    classes: int
    support_background: bool = False
    dtype: Any = jnp.float32
    builtin_cam: bool = True
    name_tag: str = "GAP"

    @nn.compact
    def __call__(self, x: Array, train: bool = False
                 ) -> Tuple[Array, Optional[Array]]:
        c = self.classes + 1 if self.support_background else self.classes
        maps = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv")(x)
        cams = jax.lax.stop_gradient(maps)
        logits = jnp.mean(maps, axis=(1, 2))
        if self.support_background:
            logits = logits[:, 1:]
        return logits, cams


class WGAP(nn.Module):
    """Global average pool then linear — the original CAM head
    (https://arxiv.org/pdf/1512.04150.pdf).  CAMs are built downstream from
    the fc weights (builtin_cam=False)."""
    classes: int
    support_background: bool = False
    dtype: Any = jnp.float32
    builtin_cam: bool = False
    name_tag: str = "WGAP"

    @nn.compact
    def __call__(self, x: Array, train: bool = False
                 ) -> Tuple[Array, Optional[Array]]:
        pre = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.classes, dtype=self.dtype, name="fc")(pre)
        return logits, None


class MaxPool(nn.Module):
    classes: int
    support_background: bool = False
    dtype: Any = jnp.float32
    builtin_cam: bool = True
    name_tag: str = "MaxPool"

    @nn.compact
    def __call__(self, x: Array, train: bool = False
                 ) -> Tuple[Array, Optional[Array]]:
        c = self.classes + 1 if self.support_background else self.classes
        maps = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv")(x)
        cams = jax.lax.stop_gradient(maps)
        logits = jnp.max(maps, axis=(1, 2))
        if self.support_background:
            logits = logits[:, 1:]
        return logits, cams


class LogSumExpPool(nn.Module):
    """LSE pooling (https://arxiv.org/pdf/1411.6228.pdf), reference
    core.py:142-174: log(mean(exp(r*(a - max))))/r + max."""
    classes: int
    support_background: bool = False
    r: float = 10.0
    dtype: Any = jnp.float32
    builtin_cam: bool = True
    name_tag: str = "LogSumExpPool"

    @nn.compact
    def __call__(self, x: Array, train: bool = False
                 ) -> Tuple[Array, Optional[Array]]:
        c = self.classes + 1 if self.support_background else self.classes
        maps = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv")(x)
        cams = jax.lax.stop_gradient(maps)
        m = jnp.max(maps, axis=(1, 2), keepdims=True)
        out = (jnp.log(jnp.mean(jnp.exp(self.r * (maps - m)),
                                axis=(1, 2))) / self.r + m[:, 0, 0, :])
        if self.support_background:
            out = out[:, 1:]
        return out, cams


def _wildcat_k(k, n: int) -> int:
    """reference wildcat.py get_k semantics."""
    if k <= 0:
        return 0
    if k < 1:
        return round(k * n)
    if k == 1 and isinstance(k, float):
        return int(n)
    if k == 1 and isinstance(k, int):
        return 1
    return int(min(k, n))


class WildCatCLHead(nn.Module):
    """WILDCAT head (CVPR'17): 1x1 conv to classes*modalities maps,
    class-wise modality mean, then kmax/kmin decision pooling
    (reference wildcat.py:18-160)."""
    classes: int
    support_background: bool = False
    modalities: int = 5
    kmax: float = 0.5
    kmin: Optional[float] = None
    alpha: float = 0.6
    dropout: float = 0.0
    dtype: Any = jnp.float32
    builtin_cam: bool = True
    name_tag: str = "WILDCAT"

    @nn.compact
    def __call__(self, x: Array, train: bool = False
                 ) -> Tuple[Array, Optional[Array]]:
        c = self.classes + 1 if self.support_background else self.classes
        mod = nn.Conv(c * self.modalities, (1, 1), dtype=self.dtype,
                      name="to_modalities")(x)
        b, h, w, _ = mod.shape
        maps = jnp.mean(mod.reshape(b, h, w, c, self.modalities), axis=-1)
        cams = jax.lax.stop_gradient(
            jnp.transpose(maps, (0, 3, 1, 2)))  # (B, C, H, W) like reference
        cams = jnp.transpose(cams, (0, 2, 3, 1))  # keep NHWC externally

        acts = maps.reshape(b, h * w, c)
        n = h * w
        srt = jnp.sort(acts, axis=1)[:, ::-1, :]  # descending
        if self.dropout > 0.0 and train:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, srt.shape)
            srt = jnp.where(keep, srt / (1.0 - self.dropout), 0.0)
        kmax = _wildcat_k(self.kmax, n)
        kmin = _wildcat_k(self.kmax if self.kmin is None else self.kmin, n)
        assert kmax != 0, "kmax=0"
        scores = jnp.sum(srt[:, :kmax, :], axis=1) / kmax
        # NOTE: parity over intent — the reference's kmin term is a no-op
        # (non-inplace Tensor.add with a discarded result,
        # wildcat.py:93-97), so the effective decision is the kmax mean
        # only; we reproduce the effective computation.
        if self.support_background:
            scores = scores[:, 1:]
        return scores, cams


def build_pooling_head(name: str, classes: int, support_background: bool,
                       r: float = 10.0, modalities: int = 5, kmax: float = 0.5,
                       kmin: Optional[float] = None, alpha: float = 0.6,
                       dropout: float = 0.0, dtype=jnp.float32) -> nn.Module:
    from tcam_wsol_video_tpu.core import constants as C
    if name == C.GAP:
        return GAP(classes=classes, support_background=support_background,
                   dtype=dtype)
    if name == C.WGAP:
        return WGAP(classes=classes, support_background=support_background,
                    dtype=dtype)
    if name == C.MAX_POOL:
        return MaxPool(classes=classes, support_background=support_background,
                       dtype=dtype)
    if name == C.LSE_POOL:
        return LogSumExpPool(classes=classes, r=r,
                             support_background=support_background,
                             dtype=dtype)
    if name == C.WILDCAT:
        return WildCatCLHead(classes=classes, modalities=modalities,
                             kmax=kmax, kmin=kmin, alpha=alpha,
                             dropout=dropout,
                             support_background=support_background,
                             dtype=dtype)
    raise ValueError(name)
