"""U-Net decoder family + task models (flax linen, NHWC).

Parity targets:
- DecoderBlock / CenterBlock / UnetFCAMDecoder
  (/root/reference/dlib/unet/decoder.py:14-287): nearest x2 upsample,
  bilinear(align_corners=True) snap to skip resolution on mismatch,
  concat, two Conv3x3+BN+ReLU, optional SCSE attention.
- SegmentationHead = 3x3 conv (/root/reference/dlib/base/heads.py:19-37);
  ReconstructionHead = 3x3 conv + range activation (heads.py:55-73).
- UnetFCAM / UnetTCAM (/root/reference/dlib/unet/model.py:140-417):
  encoder + classification head on the last feature + decoder + 2-channel
  seg head upsampled to input size; TCAM is structurally identical
  (model.py:280-417, base/model.py:258-259).

TPU-native: pure functional forward returning (cl_logits, fcams, im_recon);
no module-state caches; the frozen-classifier mode is a stop_gradient on
the encoder features + frozen BatchNorm statistics (reference
freeze_classifier, base/model.py:180-216).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tcam_wsol_video_tpu.models.poolings import build_pooling_head
from tcam_wsol_video_tpu.ops.interpolate import (
    resize_bilinear, resize_nearest, resize_nearest_then_bilinear)

Array = jax.Array


class Conv2dReLU(nn.Module):
    """Conv 3x3 + (BN) + ReLU (reference dlib/base/modules.py:10-40)."""
    out_channels: int
    kernel_size: int = 3
    padding: int = 1
    use_batchnorm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.out_channels,
                    (self.kernel_size, self.kernel_size),
                    padding=self.padding, use_bias=not self.use_batchnorm,
                    dtype=self.dtype, name="conv")(x)
        if self.use_batchnorm:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(y)
        return nn.relu(y)


class SCSEModule(nn.Module):
    """Spatial+channel squeeze-excitation (reference base/modules.py)."""
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        # channel SE
        z = jnp.mean(x, axis=(1, 2), keepdims=True)
        z = nn.Conv(max(1, c // self.reduction), (1, 1), dtype=self.dtype,
                    name="cse_fc1")(z)
        z = nn.relu(z)
        z = nn.Conv(c, (1, 1), dtype=self.dtype, name="cse_fc2")(z)
        cse = x * jax.nn.sigmoid(z)
        # spatial SE
        s = nn.Conv(1, (1, 1), dtype=self.dtype, name="sse_conv")(x)
        sse = x * jax.nn.sigmoid(s)
        return cse + sse


class DecoderBlock(nn.Module):
    out_channels: int
    use_batchnorm: bool = True
    attention: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        if (skip is not None
                and (2 * h, 2 * w) != tuple(skip.shape[1:3])):
            # fused nearest-up + bilinear snap-to-skip: one separable op,
            # no (B, 2h, 2w, C) intermediate (see resize_nearest_then_
            # bilinear; numerically the reference's two-step resample)
            x = resize_nearest_then_bilinear(
                x, (2 * h, 2 * w), skip.shape[1:3], align_corners=True)
        else:
            x = resize_nearest(x, (2 * h, 2 * w))
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
            if self.attention == "scse":
                x = SCSEModule(dtype=self.dtype, name="attention1")(x)
        x = Conv2dReLU(self.out_channels, use_batchnorm=self.use_batchnorm,
                       dtype=self.dtype, name="conv1")(x, train=train)
        x = Conv2dReLU(self.out_channels, use_batchnorm=self.use_batchnorm,
                       dtype=self.dtype, name="conv2")(x, train=train)
        if self.attention == "scse":
            x = SCSEModule(dtype=self.dtype, name="attention2")(x)
        return x


class CenterBlock(nn.Module):
    out_channels: int
    use_batchnorm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2dReLU(self.out_channels, use_batchnorm=self.use_batchnorm,
                       dtype=self.dtype, name="conv1")(x, train=train)
        x = Conv2dReLU(self.out_channels, use_batchnorm=self.use_batchnorm,
                       dtype=self.dtype, name="conv2")(x, train=train)
        return x


class UnetDecoder(nn.Module):
    """Classic U-Net decoder over staged encoder features
    (reference UnetFCAMDecoder, decoder.py:164-283)."""
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    use_batchnorm: bool = True
    attention: Optional[str] = None
    center: bool = False   # VGG uses a center block
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[Array], train: bool = False):
        # drop the input-resolution feature, reverse to start at the head
        feats = list(features[1:])[::-1]
        head, skips = feats[0], feats[1:]
        x = head
        if self.center:
            x = CenterBlock(head.shape[-1], use_batchnorm=self.use_batchnorm,
                            dtype=self.dtype, name="center")(x, train=train)
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = DecoderBlock(ch, use_batchnorm=self.use_batchnorm,
                             attention=self.attention, dtype=self.dtype,
                             name=f"block_{i}")(x, skip, train=train)
        return x


class SegmentationHead(nn.Module):
    out_channels: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels,
                       (self.kernel_size, self.kernel_size),
                       padding=self.kernel_size // 2, dtype=self.dtype,
                       name="conv")(x)


class ReconstructionHead(nn.Module):
    """3x3 conv + tanh range activation mapping to [0, img_range]
    (reference heads.py:55-73 with RANGE_TANH)."""
    out_channels: int = 3
    img_range: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x)
        return (jnp.tanh(y) + 1.0) * 0.5 * self.img_range


class UnetFCAM(nn.Module):
    """Encoder + classification head + U-Net decoder + FCAM seg head.

    __call__(x, train, freeze_cl) ->
        dict(cl_logits, fcams (B,H,W,2), im_recon, cams_head, features)
    fcams come back at input resolution (bilinear align_corners=True upsample
    on mismatch, reference base/model.py:143-148).
    """
    encoder: nn.Module
    pooling: str
    classes: int
    support_background: bool = False
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    seg_h_out_channels: int = 2
    im_rec: bool = False
    img_range: float = 1.0
    freeze_cl: bool = False
    center: bool = False
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
        self.decoder = UnetDecoder(
            decoder_channels=tuple(self.decoder_channels), center=self.center,
            dtype=self.dtype)
        self.segmentation_head = SegmentationHead(self.seg_h_out_channels,
                                                  dtype=self.dtype)
        if self.im_rec:
            self.reconstruction_head = ReconstructionHead(
                3, self.img_range, dtype=self.dtype)

    def __call__(self, x: Array, train: bool = False) -> dict:
        # when the classifier is frozen, its BN must keep running stats
        enc_train = train and not self.freeze_cl
        features = self.encoder(x, train=enc_train)
        if self.freeze_cl:
            features = [jax.lax.stop_gradient(f) for f in features]

        cl_logits, cams_head = self.classification_head(features[-1],
                                                        train=enc_train)
        if self.freeze_cl:
            cl_logits = jax.lax.stop_gradient(cl_logits)

        dec = self.decoder(features, train=train)
        fcams = self.segmentation_head(dec)
        if fcams.shape[1:3] != x.shape[1:3]:
            fcams = resize_bilinear(fcams, x.shape[1:3], align_corners=True)

        im_recon = None
        if self.im_rec:
            im_recon = self.reconstruction_head(dec)

        return {
            "cl_logits": cl_logits,
            "fcams": fcams,
            "im_recon": im_recon,
            "cams_head": cams_head,
            "features": features,
        }

    def head_from_features(self, feat: Array, train: bool = False):
        """Pooling head alone — hook point for gradient CAM extraction."""
        return self.classification_head(feat, train=train)


# TCAM is structurally identical (reference base/model.py:258-259,
# unet/model.py:280-417); kept as an alias so factory/task code reads
# like the reference.
UnetTCAM = UnetFCAM
