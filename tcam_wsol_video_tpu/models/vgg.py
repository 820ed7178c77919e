"""WSOL VGG16 encoder (flax linen, NHWC).

Parity target: the reference's WSOL16 VGG
(/root/reference/dlib/encoders/vgg.py:50-126, registry :234-243):
conv config [64,64,M, 128,128,M, 256x3,M, 512x6] + conv6(512->1024)+ReLU,
depth 3, out_channels (64, 128, 256, 1024) — output stride 8, so the last
feature map is 28x28 at 224 px.  Stages split at MaxPool boundaries; the
decoder drops stage 0 (reference UnetDecoder drops features[0]).
"""
from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# (n_convs, channels) per stage; 'M' boundaries from cfg WSOL16
_WSOL16_STAGES = (
    ((64, 64), False),          # stage 0: no leading pool
    ((128, 128), True),
    ((256, 256, 256), True),
    ((512, 512, 512, 512, 512, 512), True),   # + conv6 below
)


class VGG16WSOL(nn.Module):
    """Returns 4 staged features [64@1x, 128@1/2, 256@1/4, 1024@1/8]."""
    dtype: Any = jnp.float32
    out_channels: Tuple[int, ...] = (64, 128, 256, 1024)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> List[Array]:
        feats = []
        conv_idx = 0
        y = x
        for stage_i, (chans, pool) in enumerate(_WSOL16_STAGES):
            if pool:
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
            for c in chans:
                y = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv_{conv_idx}")(y)
                y = nn.relu(y)
                conv_idx += 1
            if stage_i == len(_WSOL16_STAGES) - 1:
                # conv6: 512 -> 1024, 3x3 (reference vgg.py:65-66)
                y = nn.Conv(1024, (3, 3), padding=1, dtype=self.dtype,
                            name="conv6")(y)
                y = nn.relu(y)
            feats.append(y)
        return feats


def vgg16_wsol(dtype=jnp.float32) -> VGG16WSOL:
    return VGG16WSOL(dtype=dtype)
