"""PixelCNN (reference satflow/models/pixel_cnn.py:8-64, wrapping pl_bolts' PixelCNN).

An autoregressive masked-convolution image model: a type-A masked 7×7 conv
followed by residual type-B masked conv blocks and a 1×1 head. The reference
uses pl_bolts' continuous-output variant (hidden representation learning /
next-frame prediction on stacked channels); same here, NHWC.

TPU note: masks are constant multipliers on the conv kernels — XLA folds them,
so masked convs cost the same as dense convs on the MXU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from satflow_tpu.core.registry import register_model
from satflow_tpu.models.unet_family import StackedImageModel


def _causal_mask(kh: int, kw: int, mask_type: str) -> np.ndarray:
    """Spatial causality mask over (kh, kw): rows above + left of center (A
    excludes the center pixel, B includes it)."""
    mask = np.zeros((kh, kw, 1, 1), dtype=np.float32)
    ch, cw = kh // 2, kw // 2
    mask[:ch] = 1.0
    mask[ch, :cw] = 1.0
    if mask_type == "B":
        mask[ch, cw] = 1.0
    return mask


class MaskedConv(nn.Module):
    features: int
    kernel_size: int = 3
    mask_type: str = "B"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        mask = jnp.asarray(_causal_mask(k, k, self.mask_type))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype) if self.dtype else x,
            (kernel * mask).astype(self.dtype) if self.dtype else kernel * mask,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias


class PixelCNNCore(nn.Module):
    out_channels: int
    hidden_channels: int = 64
    num_blocks: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = MaskedConv(self.hidden_channels, 7, "A", dtype=self.dtype, name="in")(x)
        for i in range(self.num_blocks):
            r = nn.relu(h)
            r = MaskedConv(self.hidden_channels, 3, "B", dtype=self.dtype,
                           name=f"b{i}_c0")(r)
            r = nn.relu(r)
            r = MaskedConv(self.hidden_channels, 3, "B", dtype=self.dtype,
                           name=f"b{i}_c1")(r)
            h = h + r
        h = nn.relu(h)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="out")(h)


@register_model
class PixelCNN(StackedImageModel):
    """reference satflow/models/pixel_cnn.py:8 registry entry."""

    def __init__(
        self,
        forecast_steps: int = 48,
        input_channels: int = 12,
        lr: float = 1e-3,
        loss: str = "mse",
        hidden_channels: int = 64,
        num_blocks: int = 5,
        channels_per_timestep: int = 1,
        pretrained: bool = False,
        visualize: bool = False,
        dtype: Any = None,
    ):
        self.hidden_channels = hidden_channels
        self.num_blocks = num_blocks
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
        return PixelCNNCore(
            out_channels=self.output_channels,
            hidden_channels=self.hidden_channels,
            num_blocks=self.num_blocks,
            dtype=self.dtype,
        )
