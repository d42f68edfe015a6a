"""Misc layers: lead-time conditioning, time distribution, space-to-depth, cropping.

Parity targets:
- ConditionTime — reference satflow/models/layers/ConditionTime.py:5-33 (append
  ``horizon`` one-hot channels marking forecast step ``fstep``; the MetNet trick).
- TimeDistributed — reference satflow/models/layers/TimeDistributed.py:12-49; in
  JAX this is just ``jax.vmap`` over the time axis (no low-memory python-loop
  variant needed — XLA handles the folded batch efficiently).
- space_to_depth / reverse — reference satflow/models/utils.py:23-70 (einops
  rearranges over 4D/5D tensors).
- crop_center — reference satflow/data/utils/utils.py:191-196.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn


def condition_time(x: jax.Array, fstep: int, horizon: int) -> jax.Array:
    """Append one-hot lead-time channels to a (B, T, H, W, C) or (B, H, W, C) input.

    Matches ConditionTime.py:8-20: a (horizon,) one-hot for index ``fstep`` is
    broadcast over batch/time/space and concatenated on the channel axis.
    """
    one_hot = jax.nn.one_hot(fstep, horizon, dtype=x.dtype)  # (horizon,)
    shape = x.shape[:-1] + (horizon,)
    ct = jnp.broadcast_to(one_hot, shape)
    return jnp.concatenate([x, ct], axis=-1)


class ConditionTime(nn.Module):
    """Module form of :func:`condition_time` (layers/ConditionTime.py:23-33)."""

    horizon: int

    @nn.compact
    def __call__(self, x: jax.Array, fstep: int = 0) -> jax.Array:
        return condition_time(x, fstep, self.horizon)


def time_distributed(fn: Callable, x: jax.Array, *args, **kwargs) -> jax.Array:
    """Apply ``fn`` per timestep of a (B, T, ...) tensor by folding T into batch.

    The XLA-friendly equivalent of TimeDistributed.py:12-49: one reshape in, one
    reshape out — the folded call becomes a single large batched conv/matmul.
    """
    b, t = x.shape[:2]
    y = fn(x.reshape(b * t, *x.shape[2:]), *args, **kwargs)
    return y.reshape(b, t, *y.shape[1:])


class TimeDistributed(nn.Module):
    """Wraps a module to apply it independently per timestep."""

    module: nn.Module

    @nn.compact
    def __call__(self, x: jax.Array, *args, **kwargs) -> jax.Array:
        b, t = x.shape[:2]
        y = self.module(x.reshape(b * t, *x.shape[2:]), *args, **kwargs)
        return y.reshape(b, t, *y.shape[1:])


def space_to_depth(x: jax.Array, block: int = 2) -> jax.Array:
    """NHWC / NTHWC space-to-depth (models/utils.py:23-46, NHWC convention)."""
    if x.ndim == 4:
        return rearrange(x, "b (h dh) (w dw) c -> b h w (dh dw c)", dh=block, dw=block)
    if x.ndim == 5:
        return rearrange(
            x, "b t (h dh) (w dw) c -> b t h w (dh dw c)", dh=block, dw=block
        )
    raise ValueError(f"space_to_depth expects 4D/5D NHWC input, got shape {x.shape}")


def reverse_space_to_depth(x: jax.Array, block: int = 2) -> jax.Array:
    """Inverse of :func:`space_to_depth` (models/utils.py:48-70)."""
    if x.ndim == 4:
        return rearrange(x, "b h w (dh dw c) -> b (h dh) (w dw) c", dh=block, dw=block)
    if x.ndim == 5:
        return rearrange(
            x, "b t h w (dh dw c) -> b t (h dh) (w dw) c", dh=block, dw=block
        )
    raise ValueError(f"reverse_space_to_depth expects 4D/5D input, got shape {x.shape}")


def crop_center(x: jax.Array, crop_h: int, crop_w: int) -> jax.Array:
    """Center-crop the spatial dims of an (..., H, W, C) tensor (utils.py:191-196)."""
    h, w = x.shape[-3], x.shape[-2]
    start_h = (h - crop_h) // 2
    start_w = (w - crop_w) // 2
    return x[..., start_h : start_h + crop_h, start_w : start_w + crop_w, :]
