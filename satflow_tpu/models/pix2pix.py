"""Pix2Pix conditional GAN (reference satflow/models/pix2pix.py:14-182).

Past frames stacked into channels → all future frames as channels: a unet_128
generator conditioned on the input stack, a PatchGAN discriminator scoring
concat(condition, candidate) channel pairs, vanilla GAN loss + λ·L1
(pix2pix.py:88-126). The reference's discriminator fake-label bug
(pix2pix.py:119) is fixed in GANBase.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from satflow_tpu.core.registry import register_model
from satflow_tpu.models.gan_base import GANBase
from satflow_tpu.models.unet_family import _stack_time_into_channels
from satflow_tpu.nn.gan import define_discriminator, define_generator


@register_model
class Pix2Pix(GANBase):
    def __init__(
        self,
        forecast_steps: int = 48,
        input_channels: int = 12,
        lr: float = 2e-4,
        beta1: float = 0.5,
        beta2: float = 0.999,
        num_filters: int = 64,
        generator_model: str = "unet_128",
        norm: str = "batch",
        use_dropout: bool = False,
        discriminator_model: str = "basic",
        discriminator_layers: int = 3,
        loss: str = "vanilla",
        scheduler: str = "plateau",
        lr_epochs: int = 10,
        lambda_l1: float = 100.0,
        channels_per_timestep: int = 12,
        pretrained: bool = False,
        dtype: Any = None,
    ):
        self.num_filters = num_filters
        self.generator_model = generator_model
        self.norm = norm
        self.use_dropout = use_dropout
        self.discriminator_model = discriminator_model
        self.discriminator_layers = discriminator_layers
        self.scheduler = scheduler
        self.lr_epochs = lr_epochs
        self.channels_per_timestep = channels_per_timestep
        self.dtype = dtype
        super().__init__(
            gen_lr=lr,
            disc_lr=lr,
            gan_mode=loss,
            lambda_l1=lambda_l1,
            beta1=beta1,
            beta2=beta2,
            forecast_steps=forecast_steps,
            loss="l1",  # reconstruction criterion (pix2pix.py:65 criterionL1)
            input_channels=input_channels,
            output_channels=forecast_steps * channels_per_timestep,
            pretrained=pretrained,
        )
        # the ctor's `loss` is the GAN mode (pix2pix.py:29); keep it as the
        # reflected hparam so checkpoints rebuild with the right objective
        self.loss_name = loss

    def build_module(self) -> nn.Module:
        return define_generator(
            self.generator_model,
            output_channels=self.output_channels,
            ngf=self.num_filters,
            norm=self.norm,
            use_dropout=self.use_dropout,
            dtype=self.dtype,
        )

    def build_discriminator(self) -> nn.Module:
        return define_discriminator(
            ndf=self.num_filters,
            discriminator=self.discriminator_model,
            n_layers=self.discriminator_layers or 3,
            norm=self.norm,
            dtype=self.dtype,
        )

    def prepare_batch(self, batch):
        x, y = batch
        if isinstance(x, dict):
            x = x["sat_data"]
        if isinstance(y, dict):
            y = y["sat_data"]
        x = _stack_time_into_channels(jnp.asarray(x))
        y = _stack_time_into_channels(
            jnp.asarray(y)[..., : self.channels_per_timestep]
        )
        return x, y

    def eval_batch(self, batch):
        # the training target is channels-stacked; the evaluator needs
        # time-major y to draw per-lead-time curves
        x, y = batch
        if isinstance(x, dict):
            x = x["sat_data"]
        if isinstance(y, dict):
            y = y["sat_data"]
        x = _stack_time_into_channels(jnp.asarray(x))
        y = jnp.asarray(y)[..., : self.channels_per_timestep]
        return x, y

    def disc_input(self, x, y):
        # concat(condition, candidate) on channels (pix2pix.py:97,111-121)
        return jnp.concatenate([x, y], axis=-1)

    def frame_metrics(self, y_hat, y):
        # channels-stacked output: per-frame losses over channel groups
        cpt = self.channels_per_timestep
        t = self.forecast_steps
        b, h, w, _ = y_hat.shape
        diff = jnp.square(y_hat - y).reshape(b, h, w, t, cpt)
        return {"frame_loss": jnp.mean(diff, axis=(0, 1, 2, 4))}

    def forward(self, variables, x, rng=None, train=False):
        # eval-facing forward returns time-major (B, T, H, W, cpt) like the
        # unet family (training rides GANBase.generate on stacked channels)
        if x.ndim == 5:
            x = _stack_time_into_channels(x)
        out = self.module.apply(variables, x, train=train)
        b, h, w, _ = out.shape
        out = out.reshape(b, h, w, self.forecast_steps,
                          self.channels_per_timestep)
        return jnp.moveaxis(out, 3, 1)
