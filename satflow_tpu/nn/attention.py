"""Attention layers: axial self-attention, SAGAN 2D/3D gated attention.

Parity targets:
- ``SeparableAttention`` — reference satflow/models/layers/Attention.py:7-109
  (sequential T/W/H-axis attention cells with pooled k/v and a zero-initialized
  ``gamma`` residual gate, the MetNet-style axial primitive).
- ``SAGANAttention2d`` — reference Attention.py:173-223 (1×1-conv qkv + softmax +
  gamma residual, used by the GAN discriminators).
- ``SelfAttention3d`` — reference Attention.py:112-170 (3D qkv with maxpooled k/v).
- ``AxialAttentionBlock`` — the idiomatic multi-head axial transformer block
  (Ho et al. 2019, arXiv:1912.12180) used by the MetNet aggregator.

TPU design: every attention is expressed as batched ``jnp.einsum`` contractions in
NHWC/NTHWC layout — XLA lowers them to MXU matmuls with softmax fused into the
epilogue. Axial attention over an axis of length L costs O(L²·rest) instead of a
full O((THW)²) token attention; heads stay ≥128-wide where possible to fill MXU
lanes.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _axis_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Multi-head attention along the -2 axis of (..., heads, L, d) tensors.

    Batch dims fold into one axis and route through the Pallas fused kernel on
    TPU (scores never touch HBM); exact XLA einsum fallback elsewhere.
    """
    from satflow_tpu.ops.pallas.axial_attention import axial_attention

    lead = q.shape[:-2]
    L, d = q.shape[-2:]
    out = axial_attention(
        q.reshape(-1, L, d), k.reshape(-1, k.shape[-2], d), v.reshape(-1, v.shape[-2], d)
    )
    return out.reshape(*lead, L, d)


class AxialSelfAttention(nn.Module):
    """Multi-head self-attention along one named axis of an NHWC/NTHWC tensor.

    ``axis`` indexes into the input shape (negative ok, excluding the channel
    axis). A learned positional embedding for the attended axis is added to the
    input projection (axial transformer convention).
    """

    heads: int = 4
    axis: int = -2  # which spatial/temporal axis to attend along
    qk_features: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        qk = self.qk_features or c
        axis = self.axis if self.axis >= 0 else self.axis + x.ndim
        if axis >= x.ndim - 1:
            raise ValueError(
                f"axis {self.axis} resolves to the channel axis of shape {x.shape}"
            )
        # move attended axis next to channels: (..., L, C)
        xm = jnp.moveaxis(x, axis, -2)
        length = xm.shape[-2]

        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02), (length, c)
        ).astype(xm.dtype)
        xp = xm + pos

        q = nn.DenseGeneral((self.heads, qk // self.heads), axis=-1,
                            dtype=self.dtype, name="q")(xp)
        k = nn.DenseGeneral((self.heads, qk // self.heads), axis=-1,
                            dtype=self.dtype, name="k")(xp)
        v = nn.DenseGeneral((self.heads, c // self.heads), axis=-1,
                            dtype=self.dtype, name="v")(xp)
        # (..., L, h, d) -> (..., h, L, d)
        q, k, v = (jnp.swapaxes(t, -3, -2) for t in (q, k, v))
        out = _axis_attention(q, k, v)
        out = jnp.swapaxes(out, -3, -2)  # (..., L, h, d)
        out = nn.DenseGeneral(c, axis=(-2, -1), dtype=self.dtype, name="out")(out)
        return jnp.moveaxis(out, -2, axis)


class AxialAttentionBlock(nn.Module):
    """Pre-LN axial transformer block: attn along each given axis + MLP, residual."""

    heads: int = 4
    axes: tuple = (-3, -2)  # default: H then W of an NHWC tensor
    mlp_ratio: float = 2.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        for i, axis in enumerate(self.axes):
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            x = x + AxialSelfAttention(
                heads=self.heads, axis=axis, dtype=self.dtype, name=f"attn{i}"
            )(h)
        h = nn.LayerNorm(dtype=self.dtype, name="ln_mlp")(x)
        h = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_in")(h)
        h = nn.gelu(h)
        h = nn.Dense(c, dtype=self.dtype, name="mlp_out")(h)
        return x + h


class SAGANAttention2d(nn.Module):
    """SAGAN self-attention over an NHWC image (Attention.py:173-223 semantics).

    q from 1×1 conv to C/8, k likewise (2×2-maxpooled), v to C (pooled), softmax
    over pooled positions, output projected and gated: ``gamma*out + x`` with
    gamma initialized to 0.
    """

    pool_kv: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        q = nn.Conv(max(c // 8, 1), (1, 1), dtype=self.dtype, name="query")(x)
        k = nn.Conv(max(c // 8, 1), (1, 1), dtype=self.dtype, name="key")(x)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="value")(x)
        if self.pool_kv and h % 2 == 0 and w % 2 == 0:
            k = nn.max_pool(k, (2, 2), strides=(2, 2))
            v = nn.max_pool(v, (2, 2), strides=(2, 2))
        q = q.reshape(b, h * w, -1)
        k = k.reshape(b, -1, k.shape[-1])
        v = v.reshape(b, -1, v.shape[-1])
        logits = jnp.einsum("bqd,bkd->bqk", q, k)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bqk,bkd->bqd", weights, v).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros_init(), ())
        return gamma * out + x


class SelfAttention3d(nn.Module):
    """Full attention over T·H·W tokens of an NTHWC video, pooled k/v.

    Parity with reference Attention.py:112-170: qkv via 1×1×1 convs (q,k → C/2,
    v → C), k/v maxpooled on T, gamma-gated residual.
    """

    pooling_factor: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        q = nn.Conv(c // 2, (1, 1, 1), dtype=self.dtype, name="query")(x)
        k = nn.Conv(c // 2, (1, 1, 1), dtype=self.dtype, name="key")(x)
        v = nn.Conv(c, (1, 1, 1), dtype=self.dtype, name="value")(x)
        if t % self.pooling_factor == 0 and t > 1:
            k = nn.max_pool(k, (self.pooling_factor, 1, 1),
                            strides=(self.pooling_factor, 1, 1))
            v = nn.max_pool(v, (self.pooling_factor, 1, 1),
                            strides=(self.pooling_factor, 1, 1))
        q = q.reshape(b, t * h * w, -1)
        k = k.reshape(b, -1, k.shape[-1])
        v = v.reshape(b, -1, v.shape[-1])
        weights = jax.nn.softmax(jnp.einsum("bqd,bkd->bqk", q, k), axis=-1)
        out = jnp.einsum("bqk,bkd->bqd", weights, v).reshape(b, t, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros_init(), ())
        return gamma * out + x


class SeparableAttention(nn.Module):
    """Sequential axial gated attention along T, W, H of an NTHWC video.

    The reference's SeparableAttn (Attention.py:7-109): per axis, tokens are the
    positions along that axis (all other dims folded into features), k/v pooled
    2× along the axis, gamma-gated residual. Expressed here as three einsum
    attentions — no transpose-view gymnastics, same math.
    """

    pooling_factor: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, axis in enumerate((1, 3, 2)):  # T, W, H order (Attention.py:12-16)
            x = _GatedAxialCell(
                axis=axis, pooling_factor=self.pooling_factor, dtype=self.dtype,
                name=f"cell_{'twh'[i]}",
            )(x)
        return x


class _GatedAxialCell(nn.Module):
    axis: int
    pooling_factor: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        q = nn.Conv(c // 2, (1, 1, 1), dtype=self.dtype, name="query")(x)
        k = nn.Conv(c // 2, (1, 1, 1), dtype=self.dtype, name="key")(x)
        v = nn.Conv(c, (1, 1, 1), dtype=self.dtype, name="value")(x)
        # pool along the attended axis
        L = x.shape[self.axis]
        if L % self.pooling_factor == 0 and L > 1:
            window = [1, 1, 1]
            window[self.axis - 1] = self.pooling_factor
            k = nn.max_pool(k, tuple(window), strides=tuple(window))
            v = nn.max_pool(v, tuple(window), strides=tuple(window))
        # move attended axis to -2: (..., L, C); fold the rest into batch
        qm = jnp.moveaxis(q, self.axis, -2)
        km = jnp.moveaxis(k, self.axis, -2)
        vm = jnp.moveaxis(v, self.axis, -2)
        logits = jnp.einsum("...qd,...kd->...qk", qm, km)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("...qk,...kd->...qd", weights, vm)
        out = jnp.moveaxis(out, -2, self.axis)
        gamma = self.param("gamma", nn.initializers.zeros_init(), ())
        return gamma * out + x
