"""NowcastingGAN (DGMR): deep generative nowcasting with dual discriminators.

In-repo implementation of the capability the reference pulls from the external
``skillful_nowcasting`` package (reference requirements.txt:19; config surface at
reference satflow/configs/model/nowcasting_gan.yaml:1-15: forecast_steps 24,
output_shape 128, separate gen/disc LRs, grid_lambda 20, latent/context channels,
num_samples). The reference's in-repo precursors of the same lineage —
layers/Generator.py:12-131 (ConvGRU + GResBlock stages) and
layers/Discriminator.py:231-308/392-467 (spatial/temporal discriminators) — are
covered by the same blocks (satflow_tpu/nn/dgmr_blocks.py).

Training objective (Ravuri et al. 2021): hinge GAN loss against a per-frame
spatial discriminator and a 3D temporal discriminator, plus a grid-cell
regularizer on the sample-mean prediction (λ=20).

TPU design: the 24-step sampler rollout is a single ``lax.scan`` over lead
times (ConvGRU hidden states in the carry); the ``num_samples`` Monte-Carlo
generator samples fold into the batch axis of ONE generator call; both
discriminators and the hinge losses compile into the one GAN train step.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from satflow_tpu.core.registry import register_model
from satflow_tpu.models.base import _rngs
from satflow_tpu.models.gan_base import GANBase
from satflow_tpu.nn.dgmr_blocks import (
    ContextConditioningStack,
    DBlock,
    LatentConditioningStack,
    SamplerStep,
)
from satflow_tpu.nn.misc import space_to_depth
from satflow_tpu.nn.norm import SNConv, SNDense


class DGMRGenerator(nn.Module):
    """(B, T_ctx, H, W, C) + noise → (B, forecast_steps, H, W, C_out)."""

    forecast_steps: int = 24
    out_channels: int = 1
    context_channels: int = 384
    latent_channels: int = 768
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, t, h, w, c = x.shape
        cc = self.context_channels
        scale_channels = (cc // 8, cc // 4, cc // 2, cc)  # H/4 … H/32
        contexts = ContextConditioningStack(
            scale_channels=scale_channels, dtype=self.dtype, name="context_stack"
        )(x, train)
        latent = LatentConditioningStack(
            latent_channels=self.latent_channels, dtype=self.dtype,
            name="latent_stack",
        )(self.make_rng("sample"), b, h // 32, w // 32)

        # SamplerStep is state-free (layer norm + stateless SN) so the scan
        # only needs params broadcast.
        step = nn.scan(
            SamplerStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
            length=self.forecast_steps,
        )(
            scale_channels=tuple(reversed(scale_channels)),
            out_channels=self.out_channels,
            train=train,
            dtype=self.dtype,
            name="sampler",
        )
        init_states = tuple(reversed(contexts))  # coarsest first
        latents = jnp.broadcast_to(
            latent[None], (self.forecast_steps, *latent.shape)
        )
        _, frames = step(init_states, latents)
        # frames: (F, B, H, W, C_out) → (B, F, H, W, C_out)
        return jnp.swapaxes(frames, 0, 1)


class SpatialDiscriminator(nn.Module):
    """Per-frame 2D discriminator (Discriminator.py:231-308 lineage).

    Scores a uniform subset of future frames: 2× mean-pool → space-to-depth →
    D-block chain → global sum-pool → SN linear; frame scores are summed.
    """

    num_frames: int = 8
    base_channels: int = 48
    num_layers: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, video: jax.Array, train: bool = False) -> jax.Array:
        b, t, h, w, c = video.shape
        n = min(self.num_frames, t)
        stride = max(t // n, 1)
        frames = video[:, ::stride][:, :n]  # uniform frame subset
        x = frames.reshape(b * n, h, w, c)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = space_to_depth(x, 2)
        for i in range(self.num_layers):
            ch = self.base_channels * (2**i)
            down = x.shape[1] > 1
            x = DBlock(ch, downsample=down, first=(i == 0), dtype=self.dtype,
                       name=f"d{i}")(x)
        x = jnp.sum(nn.relu(x), axis=(1, 2))
        score = SNDense(1, dtype=self.dtype, name="out")(x)
        return jnp.sum(score.reshape(b, n), axis=1)


class TemporalDiscriminator(nn.Module):
    """3D video discriminator (Discriminator.py:392-467 lineage).

    space-to-depth → two 3D D-blocks (temporal+spatial down) → per-frame 2D
    D-blocks → global sum-pool → SN linear, summed over remaining frames.
    """

    base_channels: int = 48
    num_layers: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, video: jax.Array, train: bool = False) -> jax.Array:
        b = video.shape[0]
        x = space_to_depth(video, 2)  # (B, T, H/2, W/2, 4C)
        for i in range(2):
            down_t = x.shape[1] % 2 == 0 and x.shape[1] > 1
            ch = self.base_channels * (2**i)
            h = x if i == 0 else nn.relu(x)
            h = SNConv(ch, (2 if down_t else 1, 3, 3), dtype=self.dtype,
                       name=f"t{i}_c0")(h)
            h = nn.relu(h)
            h = SNConv(ch, (1, 3, 3), dtype=self.dtype, name=f"t{i}_c1")(h)
            pool = (2 if down_t else 1, 2, 2)
            h = nn.avg_pool(h, pool, strides=pool)
            skip = nn.avg_pool(x, pool, strides=pool)
            if skip.shape[-1] != ch:
                skip = SNConv(ch, (1, 1, 1), use_bias=False, dtype=self.dtype,
                              name=f"t{i}_skip")(skip)
            x = h + skip
        bt = x.shape[0] * x.shape[1]
        t_rem = x.shape[1]
        x = x.reshape(bt, *x.shape[2:])
        for i in range(self.num_layers):
            ch = self.base_channels * (2 ** (i + 2))
            down = x.shape[1] > 1
            x = DBlock(ch, downsample=down, dtype=self.dtype, name=f"d{i}")(x)
        x = jnp.sum(nn.relu(x), axis=(1, 2))
        score = SNDense(1, dtype=self.dtype, name="out")(x)
        return jnp.sum(score.reshape(b, t_rem), axis=1)


class _DualDiscriminator(nn.Module):
    """Spatial + temporal discriminators; returns (spatial, temporal) scores."""

    base_channels: int = 48
    spatial_layers: int = 4
    temporal_layers: int = 3
    num_spatial_frames: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, context: jax.Array, video: jax.Array,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        s = SpatialDiscriminator(
            self.num_spatial_frames, self.base_channels, self.spatial_layers,
            dtype=self.dtype, name="spatial",
        )(video, train)
        # temporal discriminator sees context + future as one sequence
        full = jnp.concatenate([context, video], axis=1)
        t = TemporalDiscriminator(
            self.base_channels, self.temporal_layers, dtype=self.dtype,
            name="temporal",
        )(full, train)
        return s, t


@register_model(name="nowcastinggan")
class NowcastingGAN(GANBase):
    """Config surface of reference configs/model/nowcasting_gan.yaml."""

    def __init__(
        self,
        forecast_steps: int = 24,
        input_channels: int = 1,
        output_shape: int = 128,
        gen_lr: float = 5e-5,
        disc_lr: float = 2e-4,
        visualize: bool = False,
        pretrained: bool = False,
        conv_type: str = "standard",
        num_samples: int = 3,
        disc_steps: int = 2,
        grid_lambda: float = 20.0,
        latent_channels: int = 768,
        context_channels: int = 384,
        disc_channels: int = 48,
        disc_spatial_layers: int = 4,
        disc_temporal_layers: int = 3,
        beta1: float = 0.0,
        beta2: float = 0.999,
        dtype: Any = None,
    ):
        self.output_shape = output_shape
        self.num_samples = num_samples
        # 2 discriminator updates per generator update (Ravuri et al.; the
        # reference's skillful_nowcasting training loop does the same) —
        # consumed by train/steps.py make_gan_train_step
        self.disc_steps = disc_steps
        self.grid_lambda = grid_lambda
        self.latent_channels = latent_channels
        self.context_channels = context_channels
        self.disc_channels = disc_channels
        self.disc_spatial_layers = disc_spatial_layers
        self.disc_temporal_layers = disc_temporal_layers
        self.conv_type = conv_type
        self.dtype = dtype
        super().__init__(
            gen_lr=gen_lr,
            disc_lr=disc_lr,
            gan_mode="vanilla",  # hinge applied explicitly below
            lambda_l1=grid_lambda,
            beta1=beta1,
            beta2=beta2,
            forecast_steps=forecast_steps,
            loss="l1",
            input_channels=input_channels,
            output_channels=input_channels,
            pretrained=pretrained,
            visualize=visualize,
        )

    def build_module(self) -> nn.Module:
        return DGMRGenerator(
            forecast_steps=self.forecast_steps,
            out_channels=self.output_channels,
            context_channels=self.context_channels,
            latent_channels=self.latent_channels,
            dtype=self.dtype,
        )

    def build_discriminator(self) -> nn.Module:
        return _DualDiscriminator(
            base_channels=self.disc_channels,
            spatial_layers=self.disc_spatial_layers,
            temporal_layers=self.disc_temporal_layers,
            dtype=self.dtype,
        )

    def prepare_batch(self, batch):
        x, y = batch
        if isinstance(x, dict):
            x = x["sat_data"]
        if isinstance(y, dict):
            y = y["sat_data"]
        x = jnp.asarray(x)[..., : self.input_channels]
        y = jnp.asarray(y)[..., : self.output_channels]
        return x, y

    # -- DGMR-specific adversarial plumbing ---------------------------------

    def init_gan_variables(self, rng, batch):
        x, y = self.prepare_batch(batch)
        g_rng, d_rng, s_rng = jax.random.split(rng, 3)
        g_vars = self.module.init(dict(params=g_rng, **(_rngs(s_rng) or {})), x)
        d_vars = self.disc_module.init(d_rng, x, y)
        return g_vars, d_vars

    def _sample(self, g_vars, x, rng, train, n_samples):
        """n Monte-Carlo samples folded into the batch: one generator call."""
        b = x.shape[0]
        xs = jnp.repeat(x, n_samples, axis=0)
        mutable = [k for k in g_vars if k != "params"] if train else False
        out = self.module.apply(g_vars, xs, train=train, rngs=_rngs(rng),
                                mutable=mutable)
        y_hat, new_state = out if train else (out, None)
        y_hat = y_hat.reshape(b, n_samples, *y_hat.shape[1:])
        if new_state is None:
            new_state = {k: v for k, v in g_vars.items() if k != "params"}
        return y_hat, new_state

    def generator_loss(self, g_params, d_params, model_state, batch, rng):
        x, y = self.prepare_batch(batch)
        g_state, d_state = self._unpack_state(model_state)
        samples, new_g_state = self._sample(
            {"params": g_params, **g_state}, x, rng, True, self.num_samples
        )
        b, n = samples.shape[:2]
        flat = samples.reshape(b * n, *samples.shape[2:])
        xs = jnp.repeat(x, n, axis=0)
        s_score, t_score = self.disc_module.apply(
            {"params": d_params, **d_state}, xs, flat, False
        )
        adv = -(jnp.mean(s_score) + jnp.mean(t_score))
        mean_pred = jnp.mean(samples, axis=1)
        reg = grid_cell_regularizer(mean_pred, y)
        loss = adv + self.grid_lambda * reg
        metrics = {"loss": loss, "adv_loss": adv, "grid_reg": reg,
                   **self.frame_metrics(mean_pred, y)}
        return loss, (metrics, {"g": new_g_state, "d": d_state})

    def discriminator_loss(self, g_params, d_params, model_state, batch, rng, rng_gp):
        del rng_gp
        x, y = self.prepare_batch(batch)
        g_state, d_state = self._unpack_state(model_state)
        fake, _ = self._sample({"params": g_params, **g_state}, x, rng, False, 1)
        fake = jax.lax.stop_gradient(fake[:, 0])
        d_vars = {"params": d_params, **d_state}
        mutable = [k for k in d_state] or False
        out = self.disc_module.apply(d_vars, x, y, True, mutable=mutable)
        (s_real, t_real), new_d_state = out if mutable else (out, d_state)
        d_vars2 = {"params": d_params, **new_d_state}
        out = self.disc_module.apply(d_vars2, x, fake, True, mutable=mutable)
        (s_fake, t_fake), new_d_state = out if mutable else (out, d_state)
        loss = (
            hinge_real(s_real) + hinge_fake(s_fake)
            + hinge_real(t_real) + hinge_fake(t_fake)
        )
        metrics = {
            "loss": loss,
            "real_loss": hinge_real(s_real) + hinge_real(t_real),
            "fake_loss": hinge_fake(s_fake) + hinge_fake(t_fake),
        }
        return loss, (metrics, {"g": g_state, "d": new_d_state})

    def make_optimizers(self):
        return (
            optax.adam(self.gen_lr, b1=self.beta1, b2=self.beta2),
            optax.adam(self.disc_lr, b1=self.beta1, b2=self.beta2),
        )


def hinge_real(score: jax.Array) -> jax.Array:
    return jnp.mean(nn.relu(1.0 - score))


def hinge_fake(score: jax.Array) -> jax.Array:
    return jnp.mean(nn.relu(1.0 + score))


def grid_cell_regularizer(mean_pred: jax.Array, target: jax.Array) -> jax.Array:
    """Weighted L1 on the sample mean (Ravuri et al. eq. 2): heavier weight on
    high-intensity cells, normalized for [0, 1]-scaled imagery."""
    weights = jnp.clip(target, 0.0, 1.0)
    return jnp.mean(jnp.abs(mean_pred - target) * (1.0 + 23.0 * weights) / 24.0)
