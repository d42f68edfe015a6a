"""DGMR building blocks: G/D/L blocks, conditioning stacks, latent stack.

These replace two things at once:
- the reference's in-repo NowcastingGAN precursor layers — ``GResBlock``
  (reference satflow/models/layers/GResBlock.py:8-99: CBN→ReLU→(upsample)→SNConv
  ×2 + SN skip projection), the DGMR-style ``Generator``
  (reference satflow/models/layers/Generator.py:12-131) and the spatial/temporal
  discriminator blocks (reference satflow/models/layers/Discriminator.py), and
- the external ``skillful_nowcasting`` package providing the production
  ``NowcastingGAN`` (reference requirements.txt:19, configs/model/nowcasting_gan.yaml).

Architecture follows Ravuri et al. 2021 ("Skilful precipitation nowcasting using
deep generative models of radar"): conditioning stacks feed a ConvGRU sampler at
4 spatial scales; all convs are spectral-normalized.

TPU notes: NHWC throughout; spectral norm threads u-vectors through the
``"spectral"`` collection; D-block downsamples use mean-pool (VPU) so the SN
convs stay the only MXU ops per block; the per-lead-time sampler loop lives in
``lax.scan`` (see models/dgmr.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from satflow_tpu.nn.attention import SAGANAttention2d
from satflow_tpu.nn.misc import space_to_depth
from satflow_tpu.nn.norm import ConditionalNorm, SNConv
from satflow_tpu.nn.recurrent import ConvGRUCell


def avg_pool2(x: jax.Array) -> jax.Array:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


# 2x nearest-neighbor upsample — one definition for the whole nn package
from satflow_tpu.nn.unet_blocks import upsample2  # noqa: F401,E402


class GBlock(nn.Module):
    """Generator residual block: Norm→ReLU→(up)→SNConv→Norm→ReLU→SNConv + skip.

    ``norm="layer"`` + ``sn_stateless=True`` make the block state-free so it can
    live inside a scanned sampler step (flax lifted scan cannot initialize
    carried variable collections).
    """

    features: int
    upsample: bool = False
    norm: str = "batch"
    sn_stateless: bool = False
    dtype: Any = None

    def _norm(self, name: str, train: bool):
        if self.norm == "layer":
            return nn.LayerNorm(dtype=self.dtype, name=name)
        return nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                            name=name)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        sn = dict(stateless=self.sn_stateless, dtype=self.dtype)
        h = self._norm("bn0", train)(x)
        h = nn.relu(h)
        if self.upsample:
            h = upsample2(h)
        h = SNConv(self.features, 3, name="c0", **sn)(h)
        h = self._norm("bn1", train)(h)
        h = nn.relu(h)
        h = SNConv(self.features, 3, name="c1", **sn)(h)
        skip = x
        if self.upsample:
            skip = upsample2(skip)
        if skip.shape[-1] != self.features:
            skip = SNConv(self.features, 1, use_bias=False, name="skip", **sn)(skip)
        return h + skip


class ConditionalGBlock(nn.Module):
    """GResBlock parity (GResBlock.py:8-99): conditional BN variant of GBlock."""

    features: int
    upsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, condition: jax.Array,
                 train: bool = False) -> jax.Array:
        h = ConditionalNorm(x.shape[-1], use_running_average=not train,
                            dtype=self.dtype, name="cbn0")(x, condition)
        h = nn.relu(h)
        if self.upsample:
            h = upsample2(h)
        h = SNConv(self.features, 3, dtype=self.dtype, name="c0")(h)
        h = ConditionalNorm(self.features, use_running_average=not train,
                            dtype=self.dtype, name="cbn1")(h, condition)
        h = nn.relu(h)
        h = SNConv(self.features, 3, dtype=self.dtype, name="c1")(h)
        skip = x
        if self.upsample:
            skip = upsample2(skip)
        if skip.shape[-1] != self.features:
            skip = SNConv(self.features, 1, use_bias=False, dtype=self.dtype,
                          name="skip")(skip)
        return h + skip


class DBlock(nn.Module):
    """Discriminator residual block: (ReLU)→SNConv→ReLU→SNConv→(pool) + skip.

    The down-residual block of reference Discriminator.py:155-228, SN convs and
    mean-pool downsampling; ``first`` skips the leading ReLU (first block rule).
    """

    features: int
    downsample: bool = True
    first: bool = False
    conv_3d: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pool = _avg_pool_nd(self.conv_3d)
        h = x if self.first else nn.relu(x)
        h = SNConv(self.features, 3, dtype=self.dtype, name="c0")(h)
        h = nn.relu(h)
        h = SNConv(self.features, 3, dtype=self.dtype, name="c1")(h)
        if self.downsample:
            h = pool(h)
        skip = x
        if self.downsample:
            skip = pool(skip)
        if skip.shape[-1] != self.features:
            skip = SNConv(self.features, 1, use_bias=False, dtype=self.dtype,
                          name="skip")(skip)
        return h + skip


def _avg_pool_nd(conv_3d: bool):
    if conv_3d:
        return lambda x: nn.avg_pool(x, (1, 2, 2), strides=(1, 2, 2))
    return avg_pool2


class LBlock(nn.Module):
    """Latent-stack residual block: ReLU-conv-ReLU-conv with channel growth."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.relu(x)
        h = SNConv(self.features, 3, dtype=self.dtype, name="c0")(h)
        h = nn.relu(h)
        h = SNConv(self.features, 3, dtype=self.dtype, name="c1")(h)
        skip = x
        if skip.shape[-1] < self.features:
            extra = SNConv(self.features - skip.shape[-1], 1, use_bias=False,
                           dtype=self.dtype, name="skip")(skip)
            skip = jnp.concatenate([skip, extra], axis=-1)
        elif skip.shape[-1] > self.features:
            skip = SNConv(self.features, 1, use_bias=False, dtype=self.dtype,
                          name="skip")(skip)
        return h + skip


class ContextConditioningStack(nn.Module):
    """Past frames → per-scale context states for the sampler ConvGRUs.

    (B, T, H, W, C) → tuple of 4 tensors at H/4, H/8, H/16, H/32 with channels
    scale_channels[i]. Per frame: space-to-depth ×2 then a chain of D-blocks;
    frame features concat over T and mix with an SN conv + ReLU.
    """

    scale_channels: Sequence[int] = (48, 96, 192, 384)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, ...]:
        b, t, h, w, c = x.shape
        x = space_to_depth(x, 2)  # (B, T, H/2, W/2, 4C)
        frames = x.reshape(b * t, h // 2, w // 2, 4 * c)
        contexts = []
        feat = frames
        for i, ch in enumerate(self.scale_channels):
            feat = DBlock(max(ch // 2, 4), first=(i == 0), dtype=self.dtype,
                          name=f"d{i}")(feat)
            # stack the T frame features on channels, mix, ReLU
            fh, fw, fc = feat.shape[1:]
            stacked = feat.reshape(b, t, fh, fw, fc)
            stacked = jnp.moveaxis(stacked, 1, 3).reshape(b, fh, fw, t * fc)
            ctx = SNConv(ch, 3, dtype=self.dtype, name=f"mix{i}")(stacked)
            contexts.append(nn.relu(ctx))
        return tuple(contexts)


class LatentConditioningStack(nn.Module):
    """Noise → coarsest-scale latent (B, H/32, W/32, latent_channels).

    z ~ N(0,1) over an (H/32, W/32, shape_channels) grid → SN conv → L-blocks
    with channel growth → SAGAN attention → final L-block.
    """

    latent_channels: int = 768
    shape_channels: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, rng: jax.Array, batch: int, height: int, width: int) -> jax.Array:
        z = jax.random.normal(rng, (batch, height, width, self.shape_channels))
        h = SNConv(self.shape_channels, 3, dtype=self.dtype, name="in")(z)
        lc = self.latent_channels
        for i, ch in enumerate((lc // 32, lc // 16, lc // 4)):
            h = LBlock(max(ch, 4), dtype=self.dtype, name=f"l{i}")(h)
        h = SAGANAttention2d(pool_kv=False, dtype=self.dtype, name="attn")(h)
        return LBlock(lc, dtype=self.dtype, name="out")(h)


class SamplerStep(nn.Module):
    """One lead time through the 4-scale ConvGRU super-resolution stack.

    carry: hidden states (coarsest → finest). Input at the coarsest scale is the
    latent; each finer scale consumes the upsampled output of the previous one.
    Output: one frame at full resolution (after the depth-to-space head).
    """

    scale_channels: Sequence[int] = (384, 192, 96, 48)  # coarsest → finest
    out_channels: int = 1
    train: bool = False  # constructor flag: a call arg would be scanned over
    dtype: Any = None

    @nn.compact
    def __call__(self, carry, latent: jax.Array):
        train = self.train
        states = list(carry)
        inp = latent
        new_states = []
        for i, ch in enumerate(self.scale_channels):
            (h,) = ConvGRUCell(states[i].shape[-1], sn=True, sn_stateless=True,
                               dtype=self.dtype, name=f"gru{i}")((states[i],), inp)[0]
            new_states.append(h)
            g = SNConv(ch, 1, stateless=True, dtype=self.dtype, name=f"proj{i}")(h)
            g = GBlock(ch, upsample=True, norm="layer", sn_stateless=True,
                       dtype=self.dtype, name=f"g{i}")(g, train)
            inp = g
        out = nn.LayerNorm(dtype=self.dtype, name="ln_out")(inp)
        out = nn.relu(out)
        out = SNConv(4 * self.out_channels, 1, stateless=True, dtype=self.dtype,
                     name="head")(out)
        # depth-to-space ×2 → full resolution
        from satflow_tpu.nn.misc import reverse_space_to_depth

        frame = reverse_space_to_depth(out, 2)
        return tuple(new_states), frame
