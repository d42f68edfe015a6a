"""SSIM and MS-SSIM in pure JAX (channel-aware, nonnegative option, range convert).

Reimplements the ``pytorch_msssim`` capability the reference pulls in through its
loss registry (reference requirements.txt:11; used channel-aware with
``nonnegative_ssim`` and ``convert_range`` at reference satflow/models/pl_metnet.py:43-45).

Implementation notes for TPU: the Gaussian window is applied as two separable 1D
depthwise convolutions in NHWC layout (XLA fuses the pair); all statistics stay in
float32 regardless of input dtype to keep the variance subtraction stable in bf16
training.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Standard MS-SSIM level weights (Wang et al. 2003).
_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_blur(x: jax.Array, window: jax.Array) -> jax.Array:
    """Separable depthwise Gaussian filter over NHWC, VALID padding."""
    c = x.shape[-1]
    k = window.shape[0]
    kh = jnp.tile(window.reshape(k, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(window.reshape(1, k, 1, 1), (1, 1, 1, c))
    conv = functools.partial(
        jax.lax.conv_general_dilated,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return conv(conv(x, kh), kw)


def convert_range(
    x: jax.Array, current: Tuple[float, float] = (-1.0, 1.0), new: Tuple[float, float] = (0.0, 1.0)
) -> jax.Array:
    """Affine range remap (the loss registry's ``convert_range`` behavior)."""
    lo, hi = current
    nlo, nhi = new
    return (x - lo) / (hi - lo) * (nhi - nlo) + nlo


def _ssim_components(
    x: jax.Array,
    y: jax.Array,
    window: jax.Array,
    data_range: float,
    k1: float = 0.01,
    k2: float = 0.03,
) -> Tuple[jax.Array, jax.Array]:
    """Per-pixel SSIM map and contrast-structure (cs) map over NHWC inputs."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mu_x = _depthwise_blur(x, window)
    mu_y = _depthwise_blur(y, window)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _depthwise_blur(x * x, window) - mu_xx
    sigma_yy = _depthwise_blur(y * y, window) - mu_yy
    sigma_xy = _depthwise_blur(x * y, window) - mu_xy
    cs = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return ssim_map, cs


def ssim(
    x: jax.Array,
    y: jax.Array,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    nonnegative: bool = False,
    per_channel: bool = False,
) -> jax.Array:
    """Mean SSIM between NHWC batches (flattens leading dims beyond 4D)."""
    x, y = _flatten_video(x), _flatten_video(y)
    win_size = _clamp_win(win_size, min(x.shape[1], x.shape[2]))
    window = jnp.asarray(_gaussian_kernel1d(win_size, win_sigma))
    ssim_map, _ = _ssim_components(x, y, window, data_range)
    if nonnegative:
        ssim_map = jax.nn.relu(ssim_map)
    if per_channel:
        return jnp.mean(ssim_map, axis=(0, 1, 2))
    return jnp.mean(ssim_map)


def ms_ssim(
    x: jax.Array,
    y: jax.Array,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    weights: Sequence[float] = _MSSSIM_WEIGHTS,
    per_channel: bool = False,
) -> jax.Array:
    """Multi-scale SSIM (5 dyadic scales, Wang et al. weights) over NHWC batches.

    cs means are ReLU'd before the weighted geometric mean — the ``pytorch_msssim``
    stability convention the reference relies on for small cloud-mask patches.

    Levels are clamped so the smallest scale still fits the Gaussian window
    (weights renormalized); the reference's 64px patches support 3 levels.
    """
    x, y = _flatten_video(x), _flatten_video(y)
    min_dim = min(x.shape[1], x.shape[2])
    win_size = _clamp_win(win_size, min_dim)
    window = jnp.asarray(_gaussian_kernel1d(win_size, win_sigma))
    max_levels = max(1, int(np.floor(np.log2(min_dim / win_size))) + 1)
    weights = tuple(weights)[: min(len(weights), max_levels)]
    levels = len(weights)
    w = jnp.asarray(weights, dtype=jnp.float32)
    w = w / jnp.sum(w)

    # Per-SAMPLE (and per-channel) values through every level, geometric
    # product per sample, batch mean LAST — pytorch_msssim's order. Averaging
    # the batch before the product (the old order) diverges for batch > 1:
    # prod(mean_b(cs)) != mean_b(prod(cs)) by Jensen's inequality.
    vals = []
    for i in range(levels):
        ssim_map, cs_map = _ssim_components(x, y, window, data_range)
        if i < levels - 1:
            vals.append(jax.nn.relu(jnp.mean(cs_map, axis=(1, 2))))  # (B, C)
            x = _avg_pool2(x)
            y = _avg_pool2(y)
        else:
            vals.append(jax.nn.relu(jnp.mean(ssim_map, axis=(1, 2))))
    stack = jnp.stack(vals)  # (levels, B, C)
    per_sample = jnp.prod(stack ** w[:, None, None], axis=0)  # (B, C)
    if per_channel:
        return jnp.mean(per_sample, axis=0)
    return jnp.mean(per_sample)


def _clamp_win(win_size: int, min_dim: int) -> int:
    """Clamp the Gaussian window to the image (odd, >=1) — an 11-wide VALID
    blur on a smaller image yields an EMPTY map whose mean is NaN (skimage
    clamps the same way for tiny images, e.g. MetNet's H/16 output grids)."""
    w = min(win_size, min_dim)
    if w % 2 == 0:
        w -= 1
    return max(w, 1)


def _avg_pool2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def _flatten_video(x: jax.Array) -> jax.Array:
    """(B, T, H, W, C) → (B·T, H, W, C); pass 4D through."""
    if x.ndim == 5:
        return x.reshape(-1, *x.shape[2:])
    if x.ndim == 4:
        return x
    raise ValueError(f"ssim expects NHWC or NTHWC input, got shape {x.shape}")
