"""U-Net model family: UNet, R2U-Net (RUnet), Attention U-Net, Attention R2U-Net.

Parity targets:
- ``Unet``            — reference satflow/models/unet.py:12-108 (wraps pl_bolts
  UNet: double-conv down/up with skip concats).
- ``RUnet`` (R2U_Net) — reference satflow/models/runet.py:95-191 (recurrent
  residual blocks, 5 levels 64→1024, optional antialiased BlurPool downsampling;
  note the reference's forward is broken — ``self.module`` vs ``self.model``,
  runet.py:30/49 — this rebuild implements the intended behavior).
- ``AttentionUnet`` (AttU_Net) / ``AttentionRUnet`` (R2AttU_Net) — reference
  satflow/models/attention_unet.py:191-337 (additive attention gates on skips).

Task shape: past frames stacked into channels → all forecast frames as channels
(one conv pass, no recurrence), i.e. x (B,T,H,W,C) → (B,H,W,T·C) and output
(B,H,W,forecast_steps·cpt) reshaped back to (B,T_f,H,W,cpt).

TPU notes: everything is NHWC feedforward convs — XLA maps these straight onto
the MXU; the weight-tied RecurrentBlock applications are unrolled (t is 2) and
fuse with their BN+ReLU epilogues.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from satflow_tpu.core.registry import register_model
from satflow_tpu.models.base import BaseModel
from satflow_tpu.nn.conv import BlurPool
from satflow_tpu.nn.unet_blocks import (
    AttentionBlock,
    ConvBlock,
    RRCNNBlock,
    UpConv,
    max_pool2,
    upsample2,
)


def _level_features(features_start: int, depth: int) -> Tuple[int, ...]:
    return tuple(features_start * (2**i) for i in range(depth))


def _stack_time_into_channels(x: jax.Array) -> jax.Array:
    """(B, T, H, W, C) → (B, H, W, T·C)."""
    b, t, h, w, c = x.shape
    return jnp.moveaxis(x, 1, 3).reshape(b, h, w, t * c)


class UNetCore(nn.Module):
    """Plain U-Net (the pl_bolts architecture the reference wraps)."""

    out_channels: int
    features_start: int = 64
    depth: int = 5
    conv_type: str = "standard"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feats = _level_features(self.features_start, self.depth)
        skips = []
        for i, f in enumerate(feats):
            if i > 0:
                x = max_pool2(x)
            x = ConvBlock(f, self.conv_type, self.dtype, name=f"down{i}")(x, train)
            if i < self.depth - 1:
                skips.append(x)
        for i, f in enumerate(reversed(feats[:-1])):
            x = UpConv(f, self.conv_type, self.dtype, name=f"up{i}")(x, train)
            x = jnp.concatenate([skips.pop(), x], axis=-1)
            x = ConvBlock(f, self.conv_type, self.dtype, name=f"upconv{i}")(x, train)
        return nn.Conv(self.out_channels, (1, 1), name="head")(x)


class R2UNetCore(nn.Module):
    """R2U-Net (runet.py:113-191): RRCNN blocks; antialiased pool option."""

    out_channels: int
    features_start: int = 64
    depth: int = 5
    t: int = 2
    conv_type: str = "standard"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feats = _level_features(self.features_start, self.depth)
        antialiased = self.conv_type == "antialiased"
        skips = []
        for i, f in enumerate(feats):
            if i > 0:
                if antialiased:
                    # stride-1 maxpool + blurpool stride 2 (runet.py:116-121)
                    x = nn.max_pool(x, (2, 2), strides=(1, 1), padding="SAME")
                    x = BlurPool(stride=2, name=f"blur{i}")(x)
                else:
                    x = max_pool2(x)
            x = RRCNNBlock(f, self.t, self.conv_type, self.dtype,
                           name=f"rrcnn{i}")(x, train)
            if i < self.depth - 1:
                skips.append(x)
        for i, f in enumerate(reversed(feats[:-1])):
            x = UpConv(f, self.conv_type, self.dtype, name=f"up{i}")(x, train)
            x = jnp.concatenate([skips.pop(), x], axis=-1)
            x = RRCNNBlock(f, self.t, self.conv_type, self.dtype,
                           name=f"up_rrcnn{i}")(x, train)
        return nn.Conv(self.out_channels, (1, 1), name="head")(x)


class AttUNetCore(nn.Module):
    """Attention U-Net (attention_unet.py:191-260)."""

    out_channels: int
    features_start: int = 64
    depth: int = 5
    conv_type: str = "standard"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feats = _level_features(self.features_start, self.depth)
        skips = []
        for i, f in enumerate(feats):
            if i > 0:
                x = max_pool2(x)
            x = ConvBlock(f, self.conv_type, self.dtype, name=f"down{i}")(x, train)
            if i < self.depth - 1:
                skips.append(x)
        for i, f in enumerate(reversed(feats[:-1])):
            x = UpConv(f, self.conv_type, self.dtype, name=f"up{i}")(x, train)
            skip = skips.pop()
            skip = AttentionBlock(f // 2, self.conv_type, self.dtype,
                                  name=f"att{i}")(x, skip, train)
            x = jnp.concatenate([skip, x], axis=-1)
            x = ConvBlock(f, self.conv_type, self.dtype, name=f"upconv{i}")(x, train)
        return nn.Conv(self.out_channels, (1, 1), name="head")(x)


class R2AttUNetCore(nn.Module):
    """Attention R2U-Net (attention_unet.py:263-337)."""

    out_channels: int
    features_start: int = 64
    depth: int = 5
    t: int = 2
    conv_type: str = "standard"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feats = _level_features(self.features_start, self.depth)
        skips = []
        for i, f in enumerate(feats):
            if i > 0:
                x = max_pool2(x)
            x = RRCNNBlock(f, self.t, self.conv_type, self.dtype,
                           name=f"rrcnn{i}")(x, train)
            if i < self.depth - 1:
                skips.append(x)
        for i, f in enumerate(reversed(feats[:-1])):
            x = UpConv(f, self.conv_type, self.dtype, name=f"up{i}")(x, train)
            skip = skips.pop()
            skip = AttentionBlock(f // 2, self.conv_type, self.dtype,
                                  name=f"att{i}")(x, skip, train)
            x = jnp.concatenate([skip, x], axis=-1)
            x = RRCNNBlock(f, self.t, self.conv_type, self.dtype,
                           name=f"up_rrcnn{i}")(x, train)
        return nn.Conv(self.out_channels, (1, 1), name="head")(x)


class StackedImageModel(BaseModel):
    """Base for channels-stacked models: time folds into channels.

    x (B,T,H,W,C) → (B,H,W,T·C); output (B,H,W,steps·cpt) → (B,steps,H,W,cpt),
    where cpt = channels_per_timestep (1 for cloud-mask heads, matching the
    reference's ``out_channels=forecast_steps`` convention, unet.py:24-31).
    """

    core_cls = UNetCore

    def __init__(
        self,
        input_channels: int = 12,
        forecast_steps: int = 48,
        channels_per_timestep: int = 1,
        features_start: int = 64,
        depth: int = 5,
        lr: float = 1e-3,
        loss: str = "mse",
        visualize: bool = False,
        conv_type: str = "standard",
        pretrained: bool = False,
        dtype: Any = None,
        **core_kwargs,
    ):
        self.channels_per_timestep = channels_per_timestep
        self.features_start = features_start
        self.depth = depth
        self.conv_type = conv_type
        self.dtype = dtype
        self.core_kwargs = core_kwargs
        super().__init__(
            forecast_steps=forecast_steps,
            lr=lr,
            loss=loss,
            visualize=visualize,
            input_channels=input_channels,
            output_channels=forecast_steps * channels_per_timestep,
            pretrained=pretrained,
        )

    def build_module(self) -> nn.Module:
        return self.core_cls(
            out_channels=self.output_channels,
            features_start=self.features_start,
            depth=self.depth,
            conv_type=self.conv_type,
            dtype=self.dtype,
            **self.core_kwargs,
        )

    def prepare_batch(self, batch):
        x, y = batch
        if isinstance(x, dict):
            x = x["sat_data"]
        if isinstance(y, dict):
            y = y["sat_data"]
        x = _stack_time_into_channels(jnp.asarray(x))
        y = jnp.asarray(y)[..., : self.channels_per_timestep]
        return x, y

    def forward(self, variables, x, rng=None, train=False):
        if x.ndim == 5:
            x = _stack_time_into_channels(x)
        out = self.module.apply(variables, x, train=train)
        return self._unstack(out)

    def _unstack(self, out: jax.Array) -> jax.Array:
        b, h, w, _ = out.shape
        out = out.reshape(b, h, w, self.forecast_steps, self.channels_per_timestep)
        return jnp.moveaxis(out, 3, 1)  # (B, T_f, H, W, cpt)

    def loss(self, params, state, batch, rng, train=True):
        x, y = self.prepare_batch(batch)
        variables = {"params": params, **state}
        mutable = [k for k in state] if train else False
        out = self.module.apply(variables, x, train=train, mutable=mutable)
        y_hat, new_state = out if train else (out, state)
        y_hat = self._unstack(y_hat)
        loss = self.criterion(y_hat, y)
        metrics = {"loss": loss, **self.frame_metrics(y_hat, y)}
        return loss, (metrics, new_state if train else state)


@register_model
class Unet(StackedImageModel):
    """reference satflow/models/unet.py:12 registry entry."""

    core_cls = UNetCore


@register_model
class RUnet(StackedImageModel):
    """R2U-Net task model (reference satflow/models/runet.py:14)."""

    core_cls = R2UNetCore


@register_model
class AttentionUnet(StackedImageModel):
    """reference satflow/models/attention_unet.py:13."""

    core_cls = AttUNetCore


@register_model
class AttentionRUnet(StackedImageModel):
    """reference satflow/models/attention_unet.py (R2AttU_Net wrapper)."""

    core_cls = R2AttUNetCore
