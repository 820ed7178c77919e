"""WSOL InceptionV3 encoder (flax linen, NHWC).

Parity target: the clovaai-WSOL InceptionV3 variant used by the reference
(/root/reference/dlib/encoders/wsol_backbones/inceptionv3.py:233-305 +
encoder wrapper /root/reference/dlib/encoders/inceptionv3.py:50-130):
stem convs, InceptionA/B/C mixed blocks with Mixed_6a at stride 1 (the
"large feature map" setting), two SPG_A3 3x3 conv blocks with dropout 0.5,
every 3x3 conv forced to padding 1 and maxpools to padding 1 + ceil mode.
Stage splits (stage_idxs 3, 5, 9, 15) give features
(3@224, 64@112, 80@57, 288@29, 768@29, 1024@29) at 224 px input
(shapes verified against the reference in torch).
"""
from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _ceil_max_pool_3x3_s2(x: Array) -> Array:
    """torch MaxPool2d(3, stride=2, padding=1, ceil_mode=True): asymmetric
    (1, 2) padding reproduces ceil-mode output length (n+1)//2 + 1 for even
    n (112 -> 57, 56 -> 29)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2),
                       padding=((1, 2), (1, 2)))


class BasicConv2d(nn.Module):
    out_channels: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        y = nn.Conv(self.out_channels, self.kernel_size, strides=self.strides,
                    padding=pad, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(y)
        return nn.relu(y)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=d, name="branch1x1")(x, train)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name="branch5x5_1")(x, train)
        b5 = BasicConv2d(64, (5, 5), padding=2, dtype=d,
                         name="branch5x5_2")(b5, train)
        b3 = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=d,
                         name="branch3x3dbl_2")(b3, train)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=d,
                         name="branch3x3dbl_3")(b3, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=True)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=d,
                         name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    """Mixed_6a; the WSOL variant runs it at stride 1, padding 1
    (wsol_backbones/inceptionv3.py:96-120 with kernel_size=3, stride=1,
    padding=1)."""
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        s = (self.stride, self.stride)
        b3 = BasicConv2d(384, (3, 3), strides=s, padding=1, dtype=d,
                         name="branch3x3")(x, train)
        bd = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x, train)
        bd = BasicConv2d(96, (3, 3), padding=1, dtype=d,
                         name="branch3x3dbl_2")(bd, train)
        bd = BasicConv2d(96, (3, 3), strides=s, padding=1, dtype=d,
                         name="branch3x3dbl_3")(bd, train)
        bp = nn.max_pool(x, (3, 3), strides=s, padding=((1, 1), (1, 1)))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=d, name="branch1x1")(x, train)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7_1")(x, train)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7_2")(b7, train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7_3")(b7, train)
        bd = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7dbl_2")(bd, train)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7dbl_3")(bd, train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7dbl_4")(bd, train)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7dbl_5")(bd, train)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=True)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp, train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class SPGBlock(nn.Module):
    """Dropout(0.5) + Conv3x3 + ReLU (SPG_A3 blocks,
    wsol_backbones/inceptionv3.py:263-272)."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv")(x)
        return nn.relu(x)


class InceptionV3WSOL(nn.Module):
    dtype: Any = jnp.float32
    out_channels: Tuple[int, ...] = (3, 64, 80, 288, 768, 1024)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> List[Array]:
        d = self.dtype
        feats = [x]
        # stage 1: Conv1a(s2, p1) Conv2a(p1 after fix) Conv2b(p1)
        y = BasicConv2d(32, (3, 3), strides=(2, 2), padding=1, dtype=d,
                        name="Conv2d_1a_3x3")(x, train)
        y = BasicConv2d(32, (3, 3), padding=1, dtype=d,
                        name="Conv2d_2a_3x3")(y, train)
        y = BasicConv2d(64, (3, 3), padding=1, dtype=d,
                        name="Conv2d_2b_3x3")(y, train)
        feats.append(y)
        # stage 2: maxpool ceil + Conv3b 1x1
        y = _ceil_max_pool_3x3_s2(y)
        y = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(y, train)
        feats.append(y)
        # stage 3: Conv4a(p1) + maxpool ceil + Mixed_5b 5c
        y = BasicConv2d(192, (3, 3), padding=1, dtype=d,
                        name="Conv2d_4a_3x3")(y, train)
        y = _ceil_max_pool_3x3_s2(y)
        y = InceptionA(32, dtype=d, name="Mixed_5b")(y, train)
        y = InceptionA(64, dtype=d, name="Mixed_5c")(y, train)
        feats.append(y)
        # stage 4: Mixed_5d, 6a(stride 1), 6b..6e
        y = InceptionA(64, dtype=d, name="Mixed_5d")(y, train)
        y = InceptionB(stride=1, dtype=d, name="Mixed_6a")(y, train)
        y = InceptionC(128, dtype=d, name="Mixed_6b")(y, train)
        y = InceptionC(160, dtype=d, name="Mixed_6c")(y, train)
        y = InceptionC(160, dtype=d, name="Mixed_6d")(y, train)
        y = InceptionC(192, dtype=d, name="Mixed_6e")(y, train)
        feats.append(y)
        # stage 5: SPG_A3 blocks
        y = SPGBlock(1024, dtype=d, name="SPG_A3_1b")(y, train)
        y = SPGBlock(1024, dtype=d, name="SPG_A3_2b")(y, train)
        feats.append(y)
        return feats
