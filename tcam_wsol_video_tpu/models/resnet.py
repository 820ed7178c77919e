"""WSOL ResNet encoder (flax linen, NHWC).

Parity target: the reference's WSOL ResNet variant
(/root/reference/dlib/encoders/resnet.py:57-161) — a torchvision ResNet
with layer3 stride=1 and layer4 stride=1 (output stride 8, 28x28 maps at
224 px input) returning all six stage features for decoder tasks and the
final map for classification.  out_channels (3, 64, 256, 512, 1024, 2048)
for resnet50/101/152 (resnet.py:355-379).

TPU-native: NHWC layout (the TPU conv layout), explicit train flag instead
of module mode, features returned — never cached on the module.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + identity."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = norm("bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = norm("bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetWSOL(nn.Module):
    """ResNet-50/101/152 with the WSOL stride pattern.

    __call__ returns the list of stage features
    [x, stem, layer1, layer2, layer3, layer4] (NHWC), mirroring the
    reference's staged forward (resnet.py:140-153); classification callers
    use features[-1].
    """
    layers: Sequence[int] = (3, 4, 6, 3)   # resnet50
    stride_l3: int = 1                     # wsol: no downsampling in layer3
    stride_l4: int = 1                     # wsol: no downsampling in layer4
    dtype: Any = jnp.float32

    out_channels: Tuple[int, ...] = (3, 64, 256, 512, 1024, 2048)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        feats = [x]
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        feats.append(y)

        # maxpool 3x3 stride 2 pad 1 (torch semantics)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        plan = [
            (64, 1, "layer1"),
            (128, 2, "layer2"),
            (256, self.stride_l3, "layer3"),
            (512, self.stride_l4, "layer4"),
        ]
        for (planes, stride, lname), nblocks in zip(plan, self.layers):
            for i in range(nblocks):
                first = i == 0
                y = Bottleneck(
                    planes=planes,
                    stride=stride if first else 1,
                    downsample=first,
                    dtype=self.dtype,
                    name=f"{lname}_{i}",
                )(y, train=train)
            feats.append(y)
        return feats


def resnet50_wsol(dtype=jnp.float32) -> ResNetWSOL:
    return ResNetWSOL(layers=(3, 4, 6, 3), dtype=dtype)


def resnet101_wsol(dtype=jnp.float32) -> ResNetWSOL:
    return ResNetWSOL(layers=(3, 4, 23, 3), dtype=dtype)
