"""Segmentation-style forecasters: FCN and DeepLabV3 heads on ResNet backbones.

Parity targets:
- ``FCN`` — reference satflow/models/fcn.py:12-115 (torchvision fcn_resnet50/101
  with the stem conv swapped for N input channels; forecast_steps output
  "classes"; mse/focal losses).
- ``DeeplabV3`` — reference satflow/models/deeplabv3.py:12-120 (ASPP head on a
  dilated resnet; same wrapping; note the reference's fcn.from_config returns
  DeeplabV3 — SURVEY §2.8 defect 8 — not replicated).

Task shape matches the reference's channels-stacked convention: past frames
stacked into channels → forecast_steps output channels.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from satflow_tpu.core.registry import register_model
from satflow_tpu.models.unet_family import StackedImageModel
from satflow_tpu.nn.resnet import ResNetBackbone


class FCNHead(nn.Module):
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = x.shape[-1]
        h = nn.Conv(c // 4, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="c0")(x)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                         name="bn")(h)
        h = nn.relu(h)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="out")(h)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (DeepLabV3)."""

    features: int = 256
    rates: tuple = (12, 24, 36)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                name=name)

        branches = [
            nn.relu(bn("bn_1x1")(nn.Conv(self.features, (1, 1), use_bias=False,
                                         dtype=self.dtype, name="c_1x1")(x)))
        ]
        for i, rate in enumerate(self.rates):
            h = nn.Conv(self.features, (3, 3), kernel_dilation=(rate, rate),
                        padding="SAME", use_bias=False, dtype=self.dtype,
                        name=f"c_r{rate}")(x)
            branches.append(nn.relu(bn(f"bn_r{rate}")(h)))
        # image-level pooling branch
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                         name="c_pool")(pooled)
        pooled = nn.relu(bn("bn_pool")(pooled))
        pooled = jnp.broadcast_to(
            pooled, (x.shape[0], x.shape[1], x.shape[2], self.features)
        )
        branches.append(pooled)
        h = jnp.concatenate(branches, axis=-1)
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="proj")(h)
        return nn.relu(bn("bn_proj")(h))


class SegmentationCore(nn.Module):
    """backbone → head → bilinear upsample to input resolution."""

    out_channels: int
    backbone: str = "resnet50"
    head: str = "fcn"
    output_stride: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        stages = (3, 4, 6, 3) if self.backbone == "resnet50" else (3, 4, 23, 3)
        c5, _ = ResNetBackbone(
            stages, output_stride=self.output_stride, dtype=self.dtype,
            name="backbone",
        )(x, train)
        if self.head == "aspp":
            h = ASPP(dtype=self.dtype, name="aspp")(c5, train)
            h = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="out")(h)
        else:
            h = FCNHead(self.out_channels, dtype=self.dtype, name="head")(c5, train)
        return jax.image.resize(
            h, (x.shape[0], x.shape[1], x.shape[2], self.out_channels),
            method="bilinear",
        )


class _SegModelBase(StackedImageModel):
    backbone_name = "resnet50"
    head_name = "fcn"

    def __init__(
        self,
        forecast_steps: int = 48,
        input_channels: int = 12,
        lr: float = 1e-3,
        backbone: str = None,  # type: ignore[assignment]
        loss: str = "mse",
        channels_per_timestep: int = 1,
        pretrained: bool = False,
        visualize: bool = False,
        dtype: Any = None,
    ):
        self.backbone = backbone or self.backbone_name
        super().__init__(
            input_channels=input_channels,
            forecast_steps=forecast_steps,
            channels_per_timestep=channels_per_timestep,
            lr=lr,
            loss=loss,
            visualize=visualize,
            pretrained=pretrained,
            dtype=dtype,
        )

    def build_module(self) -> nn.Module:
        return SegmentationCore(
            out_channels=self.output_channels,
            backbone=self.backbone,
            head=self.head_name,
            dtype=self.dtype,
        )


@register_model
class FCN(_SegModelBase):
    """reference satflow/models/fcn.py:12 registry entry."""

    head_name = "fcn"


@register_model
class DeeplabV3(_SegModelBase):
    """reference satflow/models/deeplabv3.py:12 registry entry."""

    head_name = "aspp"
