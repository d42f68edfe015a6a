"""Loss registry and GAN losses.

Parity targets:
- ``get_loss(name, **kwargs)`` registry with mse / l1 / bce / focal / ssim /
  ms-ssim (channel-aware, nonnegative, convert_range) — the external
  ``nowcasting_utils.models.loss`` registry the reference models call (e.g.
  reference satflow/models/conv_lstm.py:29, pl_metnet.py:43-45, fcn.py:8).
- ``GANLoss`` (vanilla BCE / lsgan MSE / wgangp mean) — reference
  satflow/models/gan/discriminators.py:70-136.
- ``gradient_penalty`` (WGAN-GP) — reference satflow/models/gan/common.py:87-133.

Every loss is a pure ``fn(pred, target) -> scalar`` suitable for jit/grad.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from satflow_tpu.core.registry import Registry
from satflow_tpu.ops.ssim import convert_range, ms_ssim, ssim

LossFn = Callable[[jax.Array, jax.Array], jax.Array]

LOSSES = Registry("loss")


@LOSSES.register("mse")
def make_mse(**_) -> LossFn:
    def mse(pred, target):
        diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
        return jnp.mean(jnp.square(diff))

    return mse


@LOSSES.register("l1")
def make_l1(**_) -> LossFn:
    return lambda pred, target: jnp.mean(jnp.abs(pred - target))


LOSSES._entries["mae"] = LOSSES._entries["l1"]
LOSSES._entries["l2"] = LOSSES._entries["mse"]


@LOSSES.register("huber")
def make_huber(delta: float = 1.0, **_) -> LossFn:
    return lambda pred, target: jnp.mean(optax.huber_loss(pred, target, delta=delta))


@LOSSES.register("bce")
def make_bce(with_logits: bool = True, **_) -> LossFn:
    def bce(pred, target):
        if with_logits:
            return jnp.mean(optax.sigmoid_binary_cross_entropy(pred, target))
        eps = 1e-7
        p = jnp.clip(pred, eps, 1.0 - eps)
        return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))

    return bce


@LOSSES.register("focal")
def make_focal(alpha: float = 0.25, gamma: float = 2.0, with_logits: bool = True, **_) -> LossFn:
    """Binary focal loss (the reference's FocalLoss via nowcasting_utils, fcn.py:8)."""

    def focal(pred, target):
        logits = pred if with_logits else jnp.log(
            jnp.clip(pred, 1e-7, 1.0 - 1e-7) / jnp.clip(1.0 - pred, 1e-7, 1.0)
        )
        p = jax.nn.sigmoid(logits)
        ce = optax.sigmoid_binary_cross_entropy(logits, target)
        p_t = p * target + (1.0 - p) * (1.0 - target)
        alpha_t = alpha * target + (1.0 - alpha) * (1.0 - target)
        return jnp.mean(alpha_t * (1.0 - p_t) ** gamma * ce)

    return focal


@LOSSES.register("ssim")
def make_ssim(
    convert_range_flag: bool = False,
    nonnegative: bool = True,
    data_range: float = 1.0,
    **_,
) -> LossFn:
    """SSIM loss = 1 - SSIM (channel-aware; pl_metnet.py:43-45 semantics)."""

    def loss(pred, target):
        p, t = pred, target
        if convert_range_flag:
            p = convert_range(p)
            t = convert_range(t)
        return 1.0 - ssim(p, t, data_range=data_range, nonnegative=nonnegative)

    return loss


@LOSSES.register("ms_ssim")
def make_ms_ssim(
    convert_range_flag: bool = False, data_range: float = 1.0, **_
) -> LossFn:
    def loss(pred, target):
        p, t = pred, target
        if convert_range_flag:
            p = convert_range(p)
            t = convert_range(t)
        return 1.0 - ms_ssim(p, t, data_range=data_range)

    return loss


LOSSES._entries["msssim"] = LOSSES._entries["ms_ssim"]


@LOSSES.register("nll")
def make_nll(**_) -> LossFn:
    def nll(pred_log_probs, target_idx):
        return -jnp.mean(
            jnp.take_along_axis(
                pred_log_probs, target_idx[..., None].astype(jnp.int32), axis=-1
            )
        )

    return nll


def get_loss(loss: str = "mse", **kwargs) -> LossFn:
    """Loss factory; accepts a name or passes a callable straight through."""
    if callable(loss):
        return loss
    return LOSSES.create(loss, **kwargs)


# ---------------------------------------------------------------------------
# GAN losses
# ---------------------------------------------------------------------------


class GANLoss:
    """Adversarial objective over discriminator outputs (discriminators.py:70-136).

    ``gan_mode``: "vanilla" (BCE-with-logits), "lsgan" (MSE vs 1/0 targets), or
    "wgangp" (mean score, negated for real).
    """

    def __init__(
        self,
        gan_mode: str = "vanilla",
        target_real_label: float = 1.0,
        target_fake_label: float = 0.0,
    ):
        if gan_mode not in ("vanilla", "lsgan", "wgangp"):
            raise ValueError(f"gan mode {gan_mode!r} not implemented")
        self.gan_mode = gan_mode
        self.real_label = target_real_label
        self.fake_label = target_fake_label

    def __call__(self, prediction: jax.Array, target_is_real: bool) -> jax.Array:
        if self.gan_mode == "wgangp":
            return -jnp.mean(prediction) if target_is_real else jnp.mean(prediction)
        label = self.real_label if target_is_real else self.fake_label
        target = jnp.full_like(prediction, label)
        if self.gan_mode == "lsgan":
            return jnp.mean(jnp.square(prediction - target))
        return jnp.mean(optax.sigmoid_binary_cross_entropy(prediction, target))


def gradient_penalty(
    disc_fn: Callable[[jax.Array], jax.Array],
    real: jax.Array,
    fake: jax.Array,
    rng: jax.Array,
    mode: str = "mixed",
    constant: float = 1.0,
    lambda_gp: float = 10.0,
) -> jax.Array:
    """WGAN-GP penalty (gan/common.py:87-133) via jax.grad through the critic.

    ``mode``: "real", "fake", or "mixed" (random interpolates, the paper default).
    """
    if lambda_gp <= 0:
        return jnp.zeros(())
    if mode == "real":
        x = real
    elif mode == "fake":
        x = fake
    else:
        alpha_shape = (real.shape[0],) + (1,) * (real.ndim - 1)
        alpha = jax.random.uniform(rng, alpha_shape, dtype=real.dtype)
        x = alpha * real + (1.0 - alpha) * fake

    def critic_sum(inp):
        return jnp.sum(disc_fn(inp))

    grads = jax.grad(critic_sum)(x)
    grads = grads.reshape(grads.shape[0], -1)
    grad_norm = jnp.sqrt(jnp.sum(grads * grads, axis=1) + 1e-16)
    return lambda_gp * jnp.mean((grad_norm - constant) ** 2)
