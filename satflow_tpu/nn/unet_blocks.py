"""U-Net building blocks: conv/up/recurrent/attention blocks (NHWC).

Parity targets (reference satflow/models/layers/RUnetLayers.py):
- ConvBlock       — conv_block (:35-50): [conv3x3 → BN → ReLU] × 2.
- UpConv          — up_conv (:53-67): 2× nearest upsample → conv3x3 → BN → ReLU.
- RecurrentBlock  — Recurrent_block (:70-89): t-step weight-tied conv recurrence
  x1 = conv(x + x1); the torch loop runs conv(x) once then t more times — total
  t+1 applications with shared weights, reproduced exactly here.
- RRCNNBlock      — RRCNN_block (:92-104): 1×1 proj + 2 recurrent blocks + skip.
- SingleConv      — single_conv (:107-118).
- AttentionBlock  — Attention_block (:121-150): additive attention gate on skips.

All blocks take ``train`` for BatchNorm mode; ``conv_type`` selects the conv
factory variant ("standard"/"coord"/"antialiased").
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from satflow_tpu.nn.conv import get_conv_layer


def max_pool2(x: jax.Array) -> jax.Array:
    """2×2 stride-2 max pool (NHWC)."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def upsample2(x: jax.Array) -> jax.Array:
    """2× nearest-neighbor upsample (torch nn.Upsample default mode)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


class ConvBlock(nn.Module):
    features: int
    conv_type: str = "standard"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = get_conv_layer(self.conv_type)
        for i in range(2):
            x = conv(features=self.features, kernel_size=3, padding="SAME",
                     dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class UpConv(nn.Module):
    features: int
    conv_type: str = "standard"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = upsample2(x)
        conv = get_conv_layer(self.conv_type)
        x = conv(features=self.features, kernel_size=3, padding="SAME",
                 dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class SingleConv(nn.Module):
    features: int
    conv_type: str = "standard"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = get_conv_layer(self.conv_type)
        x = conv(features=self.features, kernel_size=3, padding="SAME",
                 dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class RecurrentBlock(nn.Module):
    """Weight-tied conv recurrence (RUnetLayers.py:70-89 loop semantics)."""

    features: int
    t: int = 2
    conv_type: str = "standard"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = get_conv_layer(self.conv_type)(
            features=self.features, kernel_size=3, padding="SAME",
            dtype=self.dtype, name="conv",
        )
        bn = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn")

        def step(inp):
            return nn.relu(bn(conv(inp)))

        x1 = step(x)
        for _ in range(self.t):
            x1 = step(x + x1)
        return x1


class RRCNNBlock(nn.Module):
    """Recurrent-residual block: 1×1 proj, two recurrent blocks, additive skip."""

    features: int
    t: int = 2
    conv_type: str = "standard"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = get_conv_layer(self.conv_type)
        x = conv(features=self.features, kernel_size=1, padding="SAME",
                 dtype=self.dtype, name="proj")(x)
        x1 = RecurrentBlock(self.features, self.t, self.conv_type, self.dtype,
                            name="rec0")(x, train)
        x1 = RecurrentBlock(self.features, self.t, self.conv_type, self.dtype,
                            name="rec1")(x1, train)
        return x + x1


class AttentionBlock(nn.Module):
    """Additive attention gate: psi = sigmoid(conv(relu(Wg·g + Wx·x))); x * psi."""

    features: int  # F_int
    conv_type: str = "standard"
    dtype: Any = None

    @nn.compact
    def __call__(self, g: jax.Array, x: jax.Array, train: bool = False) -> jax.Array:
        conv = get_conv_layer(self.conv_type)
        g1 = conv(features=self.features, kernel_size=1, dtype=self.dtype, name="w_g")(g)
        g1 = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn_g")(g1)
        x1 = conv(features=self.features, kernel_size=1, dtype=self.dtype, name="w_x")(x)
        x1 = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn_x")(x1)
        psi = nn.relu(g1 + x1)
        psi = conv(features=1, kernel_size=1, dtype=self.dtype, name="psi")(psi)
        psi = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn_psi")(psi)
        return x * nn.sigmoid(psi)
