"""Normalization layers: spectral norm (power iteration), conditional batch norm.

Parity targets:
- SpectralNorm wrapper with persistent power-iteration vectors updated each forward
  — reference satflow/models/layers/Normalization.py:10-62 (and the functional
  variant at reference satflow/models/layers/Discriminator.py:13-58).
- ConditionalNorm (class/noise-conditional batch norm whose affine comes from a
  linear projection of the condition) — reference
  satflow/models/layers/Normalization.py:65-86.

JAX design: the u vector lives in a ``"spectral"`` variable collection threaded
through ``Module.apply(..., mutable=["spectral"])`` during training — the functional
analog of the torch wrapper's in-place buffer update. When the collection is not
mutable (eval / loss-only passes) the stored u is used without update, matching
torch's ``eval()`` behavior. Cross-replica batch norm uses ``axis_name="data"`` so
``pmean`` of batch statistics rides ICI (the reference's ``sync_batchnorm`` flag,
configs/trainer/default.yaml:31).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _l2_normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return v * jax.lax.rsqrt(jnp.sum(v * v) + eps)


class SpectralNorm(nn.Module):
    """Shared power-iteration machinery: normalizes a weight by its top singular value.

    ``stateless=True`` runs more power iterations from a fixed deterministic
    start vector instead of persisting u — required inside ``nn.scan`` bodies
    (flax lifted scan cannot initialize carried collections), used by the DGMR
    sampler loop.
    """

    n_steps: int = 1
    eps: float = 1e-12
    stateless: bool = False

    @nn.compact
    def __call__(self, kernel: jax.Array) -> jax.Array:
        out_features = kernel.shape[-1]
        w = kernel.reshape(-1, out_features)
        if self.stateless:
            u = jnp.ones((out_features,), kernel.dtype) / (out_features**0.5)
            steps = max(self.n_steps, 3)
        else:
            u_var = self.variable(
                "spectral",
                "u",
                lambda key, shape: jax.random.normal(key, shape),
                self.make_rng("params") if self.has_rng("params") else jax.random.PRNGKey(0),
                (out_features,),
            )
            u = u_var.value
            steps = self.n_steps
        # at least one iteration: v is defined below the loop, and 0-step
        # spectral norm (sigma from a stale u, no v) isn't a meaningful mode
        steps = max(steps, 1)
        for _ in range(steps):
            v = _l2_normalize(w @ u, self.eps)
            u = _l2_normalize(w.T @ v, self.eps)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = jnp.einsum("i,io,o->", v, w, u)
        if not self.stateless and self.is_mutable_collection("spectral"):
            u_var.value = u
        return kernel / (sigma + self.eps)


class SNConv(nn.Module):
    """Conv2D/3D with spectral-normalized kernel (NHWC / NDHWC)."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    strides: Union[int, Sequence[int]] = 1
    padding: Union[str, Sequence[Tuple[int, int]], int] = "SAME"
    use_bias: bool = True
    n_steps: int = 1
    stateless: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ndim = x.ndim - 2  # spatial rank
        ks = (
            (self.kernel_size,) * ndim
            if isinstance(self.kernel_size, int)
            else tuple(self.kernel_size)
        )
        strides = (
            (self.strides,) * ndim if isinstance(self.strides, int) else tuple(self.strides)
        )
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*ks, in_features, self.features),
        )
        kernel_bar = SpectralNorm(n_steps=self.n_steps, stateless=self.stateless, name="sn")(kernel)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel_bar.shape,
            ("NHWC", "HWIO", "NHWC") if ndim == 2 else ("NDHWC", "DHWIO", "NDHWC"),
        )
        if isinstance(self.padding, int):
            padding = [(self.padding, self.padding)] * ndim
        else:
            padding = self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype) if self.dtype else x,
            kernel_bar.astype(self.dtype) if self.dtype else kernel_bar,
            window_strides=strides,
            padding=padding,
            dimension_numbers=dn,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
            # bias params stay f32; cast to the compute dtype so the add
            # doesn't promote the whole activation back to f32 under bf16
            y = y + (bias.astype(self.dtype) if self.dtype else bias)
        return y


class SNDense(nn.Module):
    """Dense layer with spectral-normalized kernel."""

    features: int
    use_bias: bool = True
    n_steps: int = 1
    stateless: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features)
        )
        kernel_bar = SpectralNorm(n_steps=self.n_steps, stateless=self.stateless, name="sn")(kernel)
        if self.dtype:
            x, kernel_bar = x.astype(self.dtype), kernel_bar.astype(self.dtype)
        y = x @ kernel_bar
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
            y = y + (bias.astype(self.dtype) if self.dtype else bias)
        return y


class SNEmbed(nn.Module):
    """Embedding table with spectral-normalized weight (projection discriminators)."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, idx: jax.Array) -> jax.Array:
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=0.02),
            (self.num_embeddings, self.features),
        )
        table_bar = SpectralNorm(name="sn")(table)
        return jnp.take(table_bar, idx, axis=0)


class ConditionalNorm(nn.Module):
    """Conditional batch norm: stats-only BN + affine from a linear on the condition.

    Reference satflow/models/layers/Normalization.py:65-86: ``embed = Linear(
    n_condition, 2C)`` initialized to (gamma=1, beta=0); out = gamma * bn(x) + beta.
    ``use_running_average`` follows the standard flax train/eval convention; batch
    stats are synchronized across the data mesh axis when inside pjit/shard_map
    (``axis_name="data"``), covering the reference's sync_batchnorm.
    """

    features: int
    use_running_average: bool = False
    momentum: float = 0.99
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jax.Array, condition: jax.Array) -> jax.Array:
        h = nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            use_bias=False,
            use_scale=False,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="bn",
        )(x)
        gamma_beta = nn.Dense(
            features=2 * self.features,
            kernel_init=nn.initializers.zeros_init(),
            bias_init=_cond_bias_init(self.features),
            dtype=self.dtype,
            name="embed",
        )(condition)
        gamma, beta = jnp.split(gamma_beta, 2, axis=-1)
        # Broadcast (B, 2C) affine over spatial dims.
        while gamma.ndim < h.ndim:
            gamma = gamma[:, None]
            beta = beta[:, None]
        return gamma * h + beta


def _cond_bias_init(features: int):
    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.concatenate(
            [jnp.ones((features,), dtype), jnp.zeros((features,), dtype)]
        ).reshape(shape)

    return init
