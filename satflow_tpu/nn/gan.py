"""GAN building blocks: pix2pix generators/discriminators, factories, init modes.

Parity targets:
- ``define_generator`` factory (resnet_6blocks/resnet_9blocks/unet_128/unet_256 or
  a prebuilt module passthrough) — reference satflow/models/gan/generators.py:12-68.
- ``ResnetGenerator`` with optional antialiased BlurPool downsampling —
  generators.py:71-205 (blurpool at :117-130).
- ``UnetGenerator`` via recursive skip blocks — generators.py:208-431.
- ``define_discriminator`` (basic/n_layers/pixel/enhanced) + ``NLayerDiscriminator``
  (PatchGAN), ``PixelDiscriminator``, ``CloudGANDiscriminator`` — reference
  satflow/models/gan/discriminators.py:139-312.
- ``get_norm_layer`` (batch/instance/none) and weight-init modes
  (normal/xavier/kaiming/orthogonal) — reference satflow/models/gan/common.py:12-85.

All NHWC. Norm selection returns a constructor so blocks stay norm-agnostic;
"instance" norm is LayerNorm over spatial dims with per-channel stats (torch
InstanceNorm2d semantics, no running stats).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from satflow_tpu.nn.conv import BlurPool


def get_initializer(init_type: str = "normal", gain: float = 0.02):
    """Weight-init factory (gan/common.py:34-85)."""
    if init_type == "normal":
        return nn.initializers.normal(stddev=gain)
    if init_type == "xavier":
        return nn.initializers.glorot_normal()
    if init_type == "kaiming":
        return nn.initializers.kaiming_normal()
    if init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=gain)
    raise ValueError(f"initialization method {init_type!r} is not implemented")


class InstanceNorm(nn.Module):
    """Per-sample, per-channel spatial normalization (InstanceNorm2d, no stats)."""

    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


class _BatchNormWrap(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)


class _NoNorm(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return x


def get_norm_layer(norm: str = "batch") -> Callable[..., nn.Module]:
    """Norm constructor by name (gan/common.py:12-31)."""
    if norm == "batch":
        return _BatchNormWrap
    if norm == "instance":
        return InstanceNorm
    if norm == "none":
        return _NoNorm
    raise ValueError(f"normalization layer {norm!r} is not found")


def _reflect_pad(x: jax.Array, p: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class ResnetBlock(nn.Module):
    features: int
    norm: str = "batch"
    use_dropout: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm_cls = get_norm_layer(self.norm)
        h = _reflect_pad(x, 1)
        h = nn.Conv(self.features, (3, 3), padding="VALID", dtype=self.dtype,
                    name="c0")(h)
        h = norm_cls(name="n0")(h, train)
        h = nn.relu(h)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h = _reflect_pad(h, 1)
        h = nn.Conv(self.features, (3, 3), padding="VALID", dtype=self.dtype,
                    name="c1")(h)
        h = norm_cls(name="n1")(h, train)
        return x + h


class ResnetGenerator(nn.Module):
    """c7s1-ngf, 2× downsample, n resnet blocks, 2× upsample, c7s1-out, tanh."""

    output_channels: int
    ngf: int = 64
    n_blocks: int = 6
    norm: str = "batch"
    use_dropout: bool = False
    antialiased: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm_cls = get_norm_layer(self.norm)
        h = _reflect_pad(x, 3)
        h = nn.Conv(self.ngf, (7, 7), padding="VALID", dtype=self.dtype, name="in")(h)
        h = norm_cls(name="in_norm")(h, train)
        h = nn.relu(h)
        # downsample ×2 (blurpool variant: stride-1 conv + BlurPool, :117-130)
        for i in range(2):
            mult = 2 ** (i + 1)
            if self.antialiased:
                h = nn.Conv(self.ngf * mult, (3, 3), strides=(1, 1), padding="SAME",
                            dtype=self.dtype, name=f"down{i}")(h)
                h = BlurPool(stride=2, name=f"blur{i}")(h)
            else:
                h = nn.Conv(self.ngf * mult, (3, 3), strides=(2, 2), padding="SAME",
                            dtype=self.dtype, name=f"down{i}")(h)
            h = norm_cls(name=f"down{i}_norm")(h, train)
            h = nn.relu(h)
        for i in range(self.n_blocks):
            h = ResnetBlock(self.ngf * 4, self.norm, self.use_dropout,
                            self.dtype, name=f"block{i}")(h, train)
        for i in range(2):
            mult = 2 ** (2 - i)
            h = nn.ConvTranspose(self.ngf * mult // 2, (3, 3), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype, name=f"up{i}")(h)
            h = norm_cls(name=f"up{i}_norm")(h, train)
            h = nn.relu(h)
        h = _reflect_pad(h, 3)
        h = nn.Conv(self.output_channels, (7, 7), padding="VALID",
                    dtype=self.dtype, name="out")(h)
        return jnp.tanh(h)


class UnetSkipBlock(nn.Module):
    """One level of the recursive pix2pix U-Net (generators.py:302-431)."""

    outer_features: int
    inner_features: int
    submodule: Optional[nn.Module] = None
    outermost: bool = False
    innermost: bool = False
    norm: str = "batch"
    use_dropout: bool = False
    output_channels: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm_cls = get_norm_layer(self.norm)
        down = nn.Conv(self.inner_features, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="down")(
            x if self.outermost else nn.leaky_relu(x, 0.2)
        )
        if not self.outermost and not self.innermost:
            down = norm_cls(name="down_norm")(down, train)
        mid = down if self.submodule is None else self.submodule(down, train)
        up_in = nn.relu(mid)
        out_feats = (
            self.output_channels if self.outermost else self.outer_features
        )
        up = nn.ConvTranspose(out_feats, (4, 4), strides=(2, 2), padding="SAME",
                              dtype=self.dtype, name="up")(up_in)
        if self.outermost:
            return jnp.tanh(up)
        up = norm_cls(name="up_norm")(up, train)
        if self.use_dropout:
            up = nn.Dropout(0.5, deterministic=not train)(up)
        return jnp.concatenate([x, up], axis=-1)


class UnetGenerator(nn.Module):
    """pix2pix U-Net generator: num_downs levels (7 = unet_128, 8 = unet_256)."""

    output_channels: int
    num_downs: int = 7
    ngf: int = 64
    norm: str = "batch"
    use_dropout: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        block = UnetSkipBlock(
            self.ngf * 8, self.ngf * 8, innermost=True, norm=self.norm,
            dtype=self.dtype, name="inner",
        )
        for i in range(self.num_downs - 5):
            block = UnetSkipBlock(
                self.ngf * 8, self.ngf * 8, submodule=block, norm=self.norm,
                use_dropout=self.use_dropout, dtype=self.dtype, name=f"mid{i}",
            )
        for i, mult in enumerate((4, 2, 1)):
            block = UnetSkipBlock(
                self.ngf * mult, self.ngf * mult * 2, submodule=block,
                norm=self.norm, dtype=self.dtype, name=f"outer{i}",
            )
        block = UnetSkipBlock(
            self.ngf, self.ngf, submodule=block, outermost=True, norm=self.norm,
            output_channels=self.output_channels, dtype=self.dtype, name="top",
        )
        return block(x, train)


def define_generator(
    generator,
    output_channels: int = 12,
    ngf: int = 64,
    norm: str = "batch",
    use_dropout: bool = False,
    **kwargs,
) -> nn.Module:
    """Generator factory (generators.py:12-68): name string or module passthrough."""
    if isinstance(generator, nn.Module):
        return generator
    if generator == "resnet_9blocks":
        return ResnetGenerator(output_channels, ngf, 9, norm, use_dropout, **kwargs)
    if generator == "resnet_6blocks":
        return ResnetGenerator(output_channels, ngf, 6, norm, use_dropout, **kwargs)
    if generator == "unet_128":
        return UnetGenerator(output_channels, 7, ngf, norm, use_dropout, **kwargs)
    if generator == "unet_256":
        return UnetGenerator(output_channels, 8, ngf, norm, use_dropout, **kwargs)
    raise ValueError(f"Generator model name {generator!r} is not recognized")


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (discriminators.py:139-225)."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm_cls = get_norm_layer(self.norm)
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="in")(x)
        h = nn.leaky_relu(h, 0.2)
        for i in range(1, self.n_layers):
            mult = min(2**i, 8)
            h = nn.Conv(self.ndf * mult, (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype, name=f"c{i}")(h)
            h = norm_cls(name=f"n{i}")(h, train)
            h = nn.leaky_relu(h, 0.2)
        mult = min(2**self.n_layers, 8)
        h = nn.Conv(self.ndf * mult, (4, 4), strides=(1, 1),
                    padding=((1, 1), (1, 1)), dtype=self.dtype, name="pre")(h)
        h = norm_cls(name="pre_norm")(h, train)
        h = nn.leaky_relu(h, 0.2)
        out = nn.Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                      dtype=self.dtype, name="out")(h)
        if 0 in out.shape:
            raise ValueError(
                f"PatchGAN output collapsed to {out.shape}: input "
                f"{x.shape[1]}x{x.shape[2]} is too small for n_layers="
                f"{self.n_layers}; use fewer layers or larger images"
            )
        return out


class PixelDiscriminator(nn.Module):
    """1×1-conv per-pixel discriminator (discriminators.py:228-262)."""

    ndf: int = 64
    norm: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm_cls = get_norm_layer(self.norm)
        h = nn.Conv(self.ndf, (1, 1), dtype=self.dtype, name="c0")(x)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.ndf * 2, (1, 1), dtype=self.dtype, name="c1")(h)
        h = norm_cls(name="n1")(h, train)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (1, 1), dtype=self.dtype, name="out")(h)


class CloudGANDiscriminator(nn.Module):
    """Conv stages + global real/fake head (discriminators.py:286-312)."""

    ndf: int = 64
    n_stages: int = 4
    norm: str = "batch"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm_cls = get_norm_layer(self.norm)
        h = x
        for i in range(self.n_stages):
            mult = min(2**i, 8)
            h = nn.Conv(self.ndf * mult, (4, 4), strides=(2, 2), padding="SAME",
                        dtype=self.dtype, name=f"c{i}")(h)
            h = norm_cls(name=f"n{i}")(h, train)
            h = nn.leaky_relu(h, 0.2)
        h = jnp.mean(h, axis=(1, 2))  # global pool replaces torch LazyLinear flatten
        return nn.Dense(1, dtype=self.dtype, name="head")(h)


def define_discriminator(
    input_channels: int = 12,
    ndf: int = 64,
    discriminator: str = "basic",
    n_layers: int = 3,
    norm: str = "batch",
    **kwargs,
) -> nn.Module:
    """Discriminator factory (discriminators.py:16-67)."""
    del input_channels  # NHWC convs infer input channels at init
    if discriminator == "basic":
        return NLayerDiscriminator(ndf, 3, norm, **kwargs)
    if discriminator == "n_layers":
        return NLayerDiscriminator(ndf, n_layers, norm, **kwargs)
    if discriminator == "pixel":
        return PixelDiscriminator(ndf, norm, **kwargs)
    if discriminator == "enhanced":
        return CloudGANDiscriminator(ndf, norm=norm, **kwargs)
    raise ValueError(f"Discriminator model name {discriminator!r} is not recognized")
