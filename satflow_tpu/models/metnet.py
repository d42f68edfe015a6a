"""MetNet-style axial-attention forecaster (in-repo, replacing the external
``metnet`` package the reference wraps at satflow/models/pl_metnet.py:15-124).

Architecture (MetNet, Sønderby et al. 2020; the openclimatefix/metnet layout the
reference depends on via requirements.txt:18):
1. spatial preprocessor: center-crop ×1/2 then space-to-depth ×2 per frame,
2. lead-time conditioning: one-hot horizon channels (ConditionTime),
3. image encoder ("downsampler"): conv stack with two 2× pools → H/4,
4. temporal encoder: ConvLSTM scan over the history, keep last hidden state,
5. spatial aggregator: axial self-attention blocks over (H, W),
6. 1×1 conv head → output channels per lead time.

Shapes match the reference example (satflow/examples/metnet_example.py:8-33):
input (B, T, 256, 256, C) with input_size=64 → output (B, forecast_steps, 16,
16, out_channels) — i.e. the center 1/4 crop at 1/4 resolution.

TPU-native redesign of the per-lead-time loop: the reference runs the whole
encoder once per forecast step inside a Python loop. Here all lead times are
evaluated in ONE batched pass — the one-hot conditioning is broadcast to an
(F·B) folded batch, so the downsampler/ConvLSTM/attention see a single large
MXU-friendly batch and XLA parallelizes across lead times for free.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from satflow_tpu.core.registry import register_model
from satflow_tpu.models.base import BaseModel
from satflow_tpu.nn.attention import AxialAttentionBlock
from satflow_tpu.nn.misc import crop_center, space_to_depth
from satflow_tpu.nn.recurrent import ConvLSTMCell
from satflow_tpu.train.schedules import warmup_cosine


class _Downsampler(nn.Module):
    """MetNet image encoder: conv 160 → pool → conv 256 ×3 → pool (H → H/4)."""

    hidden_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(160, (3, 3), padding="SAME", dtype=self.dtype, name="c0")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn0")(x)
        x = nn.relu(x)
        x = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype, name="c1")(x)
        x = nn.relu(x)
        x = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype, name="c2")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        x = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype, name="c3")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return nn.relu(x)


class _TemporalEncoderStep(nn.Module):
    features: int
    kernel_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, x_t):
        carry, h = ConvLSTMCell(self.features, kernel_size=self.kernel_size,
                                dtype=self.dtype, name="cell")(carry, x_t)
        return carry, h


class MetNetCore(nn.Module):
    """(B, T, H, W, C) → (B, forecast_steps, H/16, W/16, out_channels)."""

    forecast_steps: int = 48
    out_channels: int = 12
    hidden_dim: int = 64
    kernel_size: int = 3
    num_att_layers: int = 1
    att_heads: int = 8
    temporal_dropout: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, t, h, w, c = x.shape
        f = self.forecast_steps

        # 1. spatial preprocessor: crop to center half, space-to-depth 2.
        x = crop_center(x, h // 2, w // 2)
        x = space_to_depth(x, 2)  # (B, T, h/4, w/4, 4C)
        hh, ww = x.shape[2], x.shape[3]

        # temporal dropout on history frames (MetNet regularizer).
        if train and self.temporal_dropout > 0:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.temporal_dropout, (b, t, 1, 1, 1)
            )
            x = x * keep.astype(x.dtype) / (1.0 - self.temporal_dropout)

        # 2. lead-time conditioning, all lead times folded into batch:
        # (F, B, T, h, w, 4C + F) → (F·B, T, h, w, ·)
        one_hot = jnp.eye(f, dtype=x.dtype)  # (F, F)
        xe = jnp.broadcast_to(x[None], (f, b, t, hh, ww, x.shape[-1]))
        ohe = jnp.broadcast_to(one_hot[:, None, None, None, None, :], (f, b, t, hh, ww, f))
        xe = jnp.concatenate([xe, ohe], axis=-1).reshape(f * b, t, hh, ww, -1)

        # 3. image encoder per frame (fold (F·B, T) into one huge conv batch).
        frames = xe.reshape(f * b * t, hh, ww, xe.shape[-1])
        enc = _Downsampler(self.hidden_dim, dtype=self.dtype, name="image_encoder")(
            frames, train
        )
        eh, ew = enc.shape[1], enc.shape[2]
        enc = enc.reshape(f * b, t, eh, ew, enc.shape[-1])

        # 4. temporal encoder: ConvLSTM scan over history, keep final hidden.
        scan = nn.scan(
            _TemporalEncoderStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )(self.hidden_dim, self.kernel_size, self.dtype, name="temporal_encoder")
        carry0 = ConvLSTMCell.init_carry(f * b, eh, ew, self.hidden_dim, enc.dtype)
        (hN, _), _ = scan(carry0, enc)

        # 5. axial attention over (H, W).
        z = hN
        for i in range(self.num_att_layers):
            z = AxialAttentionBlock(
                heads=self.att_heads, axes=(-3, -2), dtype=self.dtype, name=f"axial{i}"
            )(z)

        # 6. head.
        out = nn.Conv(self.out_channels, (1, 1), name="head")(z)
        out = out.reshape(f, b, eh, ew, self.out_channels)
        return jnp.swapaxes(out, 0, 1)  # (B, F, h', w', C_out)


@register_model
class LitMetNet(BaseModel):
    """Task wrapper (reference satflow/models/pl_metnet.py:15-124).

    ``prepare_batch`` concatenates satellite + repeated topographic + NWP
    channels (reference _combine_data_sources, pl_metnet.py:90-107); targets are
    center-cropped + downsampled to the model's output geometry. Optimizer:
    Adam + linear-warmup cosine (pl_metnet.py:70-88).
    """

    def __init__(
        self,
        image_encoder: str = "downsampler",
        input_channels: int = 12,
        sat_channels: int = 12,
        input_size: int = 256,
        output_channels: int = 12,
        hidden_dim: int = 64,
        kernel_size: int = 3,
        num_layers: int = 1,
        num_att_layers: int = 1,
        head: str = "identity",
        forecast_steps: int = 48,
        temporal_dropout: float = 0.2,
        lr: float = 1e-3,
        pretrained: bool = False,
        visualize: bool = False,
        loss: str = "mse",
        warmup_steps: int = 1000,
        total_steps: int = 100_000,
        dtype: Any = None,
    ):
        self.sat_channels = sat_channels
        self.input_size = input_size
        self.hidden_dim = hidden_dim
        self.kernel_size = kernel_size
        self.num_att_layers = num_att_layers
        self.temporal_dropout = temporal_dropout
        self.warmup_steps = warmup_steps
        self.total_steps = total_steps
        self.dtype = dtype
        # SSIM-family criteria are built channel-aware with nonnegative +
        # range conversion, as the reference does (pl_metnet.py:43-45).
        if isinstance(loss, str) and "ssim" in loss:
            from satflow_tpu.nn.losses import get_loss as _get_loss

            criterion = _get_loss(loss, convert_range_flag=True, nonnegative=True,
                                  channel=output_channels)
            self._loss_name = loss
            loss = criterion
        super().__init__(
            forecast_steps=forecast_steps,
            lr=lr,
            loss=loss,
            visualize=visualize,
            input_channels=input_channels,
            output_channels=output_channels,
            pretrained=pretrained,
        )
        if hasattr(self, "_loss_name"):
            self.loss_name = self._loss_name  # keep the registry name for ckpts

    def build_module(self) -> nn.Module:
        return MetNetCore(
            forecast_steps=self.forecast_steps,
            out_channels=self.output_channels,
            hidden_dim=self.hidden_dim,
            kernel_size=self.kernel_size,
            num_att_layers=self.num_att_layers,
            temporal_dropout=self.temporal_dropout,
            dtype=self.dtype,
        )

    def prepare_batch(self, batch):
        from satflow_tpu.data import consts

        x, y = batch
        if isinstance(x, dict):
            sat = jnp.asarray(x[consts.SATELLITE_DATA])
            parts = [sat]
            topo = x.get(consts.TOPOGRAPHIC_DATA)
            if topo is not None:
                topo = jnp.asarray(topo)
                if topo.ndim == 3:
                    topo = topo[..., None]
                parts.append(
                    jnp.broadcast_to(
                        topo[:, None], (sat.shape[0], sat.shape[1], *topo.shape[1:])
                    )
                )
            nwp = x.get(consts.NWP_DATA)
            if nwp is not None:
                nwp = jnp.asarray(nwp)  # (B, C_nwp, T, h', w')
                nwp = jnp.moveaxis(nwp, 1, -1)  # (B, T, h', w', C_nwp)
                nwp = jax.image.resize(
                    nwp,
                    (sat.shape[0], sat.shape[1], sat.shape[2], sat.shape[3], nwp.shape[-1]),
                    method="nearest",
                )
                parts.append(nwp)
            x = jnp.concatenate(parts, axis=-1)
        if isinstance(y, dict):
            y = jnp.asarray(y[consts.SATELLITE_DATA])
        # Target geometry: model outputs the center 1/4 crop at 1/4 resolution.
        y = crop_center(y, x.shape[2] // 4, x.shape[3] // 4)
        y = _avg_pool_frames(y, factor=4)
        y = y[..., : self.output_channels]
        return x, y

    @property
    def lr_schedule(self):
        return warmup_cosine(self.lr, self.warmup_steps, self.total_steps)

    def make_optimizer(self) -> optax.GradientTransformation:
        return optax.adam(self.lr_schedule)


def _avg_pool_frames(y: jax.Array, factor: int) -> jax.Array:
    """Average-pool the spatial dims of a (B, T, H, W, C) target by ``factor``."""
    b, t, h, w, c = y.shape
    y = y.reshape(b * t, h, w, c)
    y = jax.lax.reduce_window(
        y, 0.0, jax.lax.add, (1, factor, factor, 1), (1, factor, factor, 1), "VALID"
    ) / float(factor * factor)
    return y.reshape(b, t, h // factor, w // factor, c)
