"""Convolution primitives: conv factory, CoordConv, BlurPool (antialiased downsample).

TPU notes: all spatial tensors are NHWC (``(B, H, W, C)``) — the native layout for
XLA TPU convolutions — and convs default to bfloat16-friendly initializers. The
factory mirrors reference satflow/models/utils.py:8-20 (``get_conv_layer`` with
"standard"/"coord"/"antialiased"/"3d"); CoordConv mirrors reference
satflow/models/layers/CoordConv.py:5-56; BlurPool reimplements the
``antialiased_cnns.BlurPool`` dependency (reference requirements.txt:2) as a fixed
binomial depthwise convolution.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _pair(k: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(k, int):
        return (k, k)
    return tuple(k)  # type: ignore[return-value]


class AddCoords(nn.Module):
    """Append normalized x/y (and optional radius) channels to an NHWC tensor.

    Behavior of reference satflow/models/layers/CoordConv.py:5-41: coordinates are
    linspaced over [-1, 1] per spatial dim; ``with_r`` adds sqrt(x² + y²).
    """

    with_r: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, _ = x.shape
        yy = jnp.linspace(-1.0, 1.0, h, dtype=x.dtype)[:, None]
        xx = jnp.linspace(-1.0, 1.0, w, dtype=x.dtype)[None, :]
        yy = jnp.broadcast_to(yy, (h, w))
        xx = jnp.broadcast_to(xx, (h, w))
        coords = [xx, yy]
        if self.with_r:
            coords.append(jnp.sqrt(xx * xx + yy * yy))
        coord_stack = jnp.stack(coords, axis=-1)  # (H, W, 2 or 3)
        coord_stack = jnp.broadcast_to(coord_stack[None], (b, h, w, coord_stack.shape[-1]))
        return jnp.concatenate([x, coord_stack], axis=-1)


class CoordConv(nn.Module):
    """Conv2D over input with appended coordinate channels (CoordConv.py:44-56)."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[str, int] = "SAME"
    use_bias: bool = True
    with_r: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = AddCoords(with_r=self.with_r)(x)
        return nn.Conv(
            features=self.features,
            kernel_size=_pair(self.kernel_size),
            strides=_pair(self.strides),
            padding=self.padding if isinstance(self.padding, str) else _pair(self.padding),
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


def _binomial_filter(size: int) -> np.ndarray:
    """1D binomial (Pascal) filter used by antialiased BlurPool."""
    a = np.poly1d([0.5, 0.5]) ** (size - 1)
    return a.coeffs.astype(np.float32)


class BlurPool(nn.Module):
    """Antialiased downsampling: fixed binomial blur + strided subsample.

    Replaces the ``antialiased_cnns.BlurPool`` native dependency. Implemented as a
    depthwise conv with a constant (non-trainable) separable binomial kernel so XLA
    lowers it onto the MXU as a grouped convolution.
    """

    filter_size: int = 4
    stride: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        f1 = _binomial_filter(self.filter_size)
        f2 = np.outer(f1, f1)
        f2 = f2 / f2.sum()
        kernel = jnp.asarray(f2, dtype=x.dtype)[:, :, None, None]  # (k, k, 1, 1)
        kernel = jnp.tile(kernel, (1, 1, 1, c))  # depthwise: (k, k, 1, C)
        pad = (self.filter_size - 1) // 2
        pad_hi = self.filter_size - 1 - pad
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride, self.stride),
            padding=((pad, pad_hi), (pad, pad_hi)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )


class AntialiasedConv(nn.Module):
    """Conv (stride 1) followed by BlurPool when a stride is requested."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[str, int] = "SAME"
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        stride = _pair(self.strides)[0]
        x = nn.Conv(
            features=self.features,
            kernel_size=_pair(self.kernel_size),
            strides=(1, 1),
            padding=self.padding if isinstance(self.padding, str) else _pair(self.padding),
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        if stride > 1:
            x = BlurPool(stride=stride)(x)
        return x


def get_conv_layer(conv_type: str = "standard") -> Callable[..., nn.Module]:
    """Conv factory with the reference's four variants (models/utils.py:8-20).

    Returns a flax Module class taking (features, kernel_size, strides, padding).
    ``"3d"`` returns ``nn.Conv`` as well — flax convs are rank-agnostic, so callers
    pass 3-tuple kernel sizes over NDHWC tensors.
    """
    if conv_type == "standard":
        return nn.Conv
    if conv_type == "coord":
        return CoordConv
    if conv_type == "antialiased":
        return AntialiasedConv
    if conv_type == "3d":
        return nn.Conv
    raise ValueError(f"Unknown conv_type {conv_type!r}")
