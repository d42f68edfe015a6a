"""ResNet backbones (50/101) for the segmentation heads.

In-repo replacement for the torchvision backbones the reference wraps
(reference satflow/models/fcn.py:41-44 and deeplabv3.py:46-49 swap conv1 for
N-channel input and use resnet50/101 bodies). Bottleneck ResNet-v1 with
optional dilation in the last stages (DeepLab output-stride 8/16), NHWC.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dilation: int = 1
    project: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                name=name)

        residual = x
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="c0")(x)
        h = nn.relu(bn("bn0")(h))
        h = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            kernel_dilation=(self.dilation, self.dilation), padding="SAME",
            use_bias=False, dtype=self.dtype, name="c1",
        )(h)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="c2")(h)
        h = bn("bn2")(h)
        if self.project:
            residual = nn.Conv(
                self.features * 4, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="proj",
            )(x)
            residual = bn("bn_proj")(residual)
        return nn.relu(h + residual)


class ResNetBackbone(nn.Module):
    """ResNet-50/101 body; returns the C5 feature map (and C4 for aux heads)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # resnet50; (3,4,23,3) = resnet101
    width: int = 64
    output_stride: int = 16  # 8/16/32; <32 dilates the later stages (DeepLab)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        h = nn.Conv(self.width, (7, 7), strides=(2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="stem_bn")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")

        current_stride = 4
        dilation = 1
        c4 = h
        for i, blocks in enumerate(self.stage_sizes):
            features = self.width * (2**i)
            if i == 0:
                stride = 1
            elif current_stride >= self.output_stride:
                stride = 1
                dilation *= 2
            else:
                stride = 2
                current_stride *= 2
            for b in range(blocks):
                h = Bottleneck(
                    features,
                    strides=stride if b == 0 else 1,
                    dilation=dilation,
                    project=(b == 0),
                    dtype=self.dtype,
                    name=f"stage{i}_block{b}",
                )(h, train)
            if i == len(self.stage_sizes) - 2:
                c4 = h
        return h, c4


def resnet50(output_stride: int = 16, dtype=None) -> ResNetBackbone:
    return ResNetBackbone((3, 4, 6, 3), output_stride=output_stride, dtype=dtype)


def resnet101(output_stride: int = 16, dtype=None) -> ResNetBackbone:
    return ResNetBackbone((3, 4, 23, 3), output_stride=output_stride, dtype=dtype)
