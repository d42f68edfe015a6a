"""CloudGAN: past frames → future frames as a conditional GAN.

Parity with reference satflow/models/cloudgan.py:16-392 (based on
climatechange.ai ICML21 paper 54):
- generator: R2U-Net (all frames at once, channels-stacked) or ConvLSTM
  (autoregressive video rollout) or any ``define_generator`` name
  (cloudgan.py:86-100),
- discriminator: "enhanced" CloudGAN head by default; scores
  concat(input-stack, candidate-stack) in all-timestep mode, or each frame
  independently in per-timestep (``condition_time``) mode (cloudgan.py:108-114),
- objective: GANLoss + λ·recon (l1 or ssim, cloudgan.py:118-119); per-timestep
  mode averages frame losses — here the frame loop is a fold-into-batch
  (one big discriminator call instead of F small ones),
- two-optimizer Adam with plateau/cosine/warmup schedulers (cloudgan.py:335-362).

The reference's per-timestep discriminator fake-label bug (cloudgan.py:266) is
fixed in GANBase.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from satflow_tpu.core.registry import register_model
from satflow_tpu.models.conv_lstm import ConvLSTMCore
from satflow_tpu.models.gan_base import GANBase
from satflow_tpu.models.unet_family import R2UNetCore, _stack_time_into_channels
from satflow_tpu.nn.gan import define_discriminator, define_generator
from satflow_tpu.nn.losses import get_loss


class _StackedGenWrapper(nn.Module):
    """Adapts a channels-stacked generator to video-in/video-out."""

    gen: nn.Module
    forecast_steps: int
    channels_per_timestep: int

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if x.ndim == 5:
            x = _stack_time_into_channels(x)
        out = self.gen(x, train)
        b, h, w, _ = out.shape
        out = out.reshape(b, h, w, self.forecast_steps, self.channels_per_timestep)
        return jnp.moveaxis(out, 3, 1)


@register_model
class CloudGAN(GANBase):
    def __init__(
        self,
        forecast_steps: int = 48,
        input_channels: int = 12,
        lr: float = 2e-4,
        beta1: float = 0.5,
        beta2: float = 0.999,
        num_filters: int = 64,
        generator_model: str = "runet",
        norm: str = "batch",
        use_dropout: bool = False,
        discriminator_model: str = "enhanced",
        discriminator_layers: int = 3,
        loss: str = "vanilla",
        scheduler: str = "plateau",
        lr_epochs: int = 10,
        lambda_l1: float = 100.0,
        l1_loss: str = "l1",
        channels_per_timestep: int = 12,
        condition_time: bool = False,
        pretrained: bool = False,
        features_start: int = 16,
        unet_depth: int = 5,
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
        self.condition_time = condition_time
        self.features_start = features_start
        self.unet_depth = unet_depth
        self.dtype = dtype
        self.recurrent = generator_model == "convlstm"
        super().__init__(
            gen_lr=lr,
            disc_lr=lr,
            gan_mode=loss,
            lambda_l1=lambda_l1,
            beta1=beta1,
            beta2=beta2,
            forecast_steps=forecast_steps,
            loss=get_loss(l1_loss, channels=channels_per_timestep),
            input_channels=input_channels,
            output_channels=forecast_steps * channels_per_timestep,
            pretrained=pretrained,
        )
        # reflected hparams: ctor `loss` is the GAN mode, `l1_loss` the
        # reconstruction criterion name (cloudgan.py:33,35)
        self.loss_name = loss
        self.l1_loss = l1_loss

    def build_module(self) -> nn.Module:
        if self.generator_model == "runet":
            gen = R2UNetCore(
                out_channels=self.output_channels,
                features_start=self.features_start,
                depth=self.unet_depth,
                t=3,  # cloudgan.py:87 R2U_Net(..., t=3)
                dtype=self.dtype,
            )
            return _StackedGenWrapper(gen, self.forecast_steps,
                                      self.channels_per_timestep)
        if self.generator_model == "convlstm":
            return ConvLSTMCore(
                hidden_dim=self.num_filters,
                out_channels=self.channels_per_timestep,
                forecast_steps=self.forecast_steps,
                dtype=self.dtype,
            )
        gen = define_generator(
            self.generator_model,
            output_channels=self.output_channels,
            ngf=self.num_filters,
            norm=self.norm,
            use_dropout=self.use_dropout,
            dtype=self.dtype,
        )
        return _StackedGenWrapper(gen, self.forecast_steps, self.channels_per_timestep)

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
        x = jnp.asarray(x)
        y = jnp.asarray(y)[..., : self.channels_per_timestep]
        return x, y

    def disc_input(self, x, y):
        if self.condition_time:
            # per-timestep mode: score each frame independently — fold frames
            # into the batch (cloudgan.py:153-181 loop, vectorized). NOTE:
            # like the reference, the discriminator sees ONLY the candidate
            # frame here — the input-conditioning is commented out upstream
            # (reference cloudgan.py:145-146 "# x = self.ct.forward(images,
            # i)"), so the per-frame GAN term is unconditional by design;
            # use condition_time=False for the conditioned objective.
            b, t, h, w, c = y.shape
            return y.reshape(b * t, h, w, c)
        # all-timestep mode: concat(input stack, candidate stack) on channels
        return jnp.concatenate(
            [_stack_time_into_channels(x), _stack_time_into_channels(y)], axis=-1
        )
