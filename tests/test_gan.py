"""GAN tests: generator/discriminator libraries and the two-optimizer train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from satflow_tpu.core.registry import create_model
from satflow_tpu.data.fake import FakeDataset
from satflow_tpu.nn.gan import (
    NLayerDiscriminator,
    PixelDiscriminator,
    ResnetGenerator,
    UnetGenerator,
    define_discriminator,
    define_generator,
)
from satflow_tpu.train.state import GANTrainState
from satflow_tpu.train.steps import make_gan_train_step
import satflow_tpu.models  # noqa: F401


def _finite(x):
    return bool(jnp.all(jnp.isfinite(x)))


class TestGANLibrary:
    def test_resnet_generator(self, rng):
        gen = ResnetGenerator(output_channels=3, ngf=4, n_blocks=2)
        x = jax.random.normal(rng, (1, 16, 16, 2))
        variables = gen.init(rng, x)
        y, _ = gen.apply(variables, x, True, mutable=["batch_stats"])
        assert y.shape == (1, 16, 16, 3) and _finite(y)
        assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh output

    def test_unet_generator_128(self, rng):
        gen = UnetGenerator(output_channels=2, num_downs=5, ngf=2)
        x = jax.random.normal(rng, (1, 32, 32, 3))
        variables = gen.init(rng, x)
        y, _ = gen.apply(variables, x, True, mutable=["batch_stats"])
        assert y.shape == (1, 32, 32, 2) and _finite(y)

    def test_patchgan_discriminator(self, rng):
        disc = NLayerDiscriminator(ndf=4, n_layers=2)
        x = jax.random.normal(rng, (2, 16, 16, 3))
        variables = disc.init(rng, x)
        y, _ = disc.apply(variables, x, True, mutable=["batch_stats"])
        assert y.shape[0] == 2 and y.shape[-1] == 1 and _finite(y)

    def test_pixel_discriminator(self, rng):
        disc = PixelDiscriminator(ndf=4)
        x = jax.random.normal(rng, (2, 8, 8, 3))
        variables = disc.init(rng, x)
        y, _ = disc.apply(variables, x, True, mutable=["batch_stats"])
        assert y.shape == (2, 8, 8, 1)

    def test_factories_reject_unknown(self):
        with pytest.raises(ValueError):
            define_generator("nope")
        with pytest.raises(ValueError):
            define_discriminator(discriminator="nope")


def _tiny_batch(cpt=2, steps=2):
    ds = FakeDataset(batch_size=2, width=16, height=16, number_sat_channels=cpt,
                     history_minutes=10, forecast_minutes=5 * steps, length=1)
    return ds[0]


def _run_gan_steps(model, batch, rng, n=2):
    g_vars, d_vars = model.init_gan_variables(rng, batch)
    g_params, g_state = model.split_variables(g_vars)
    d_params, d_state = model.split_variables(d_vars)
    g_tx, d_tx = model.make_optimizers()
    state = GANTrainState.create(
        g_params, d_params, {"g": g_state, "d": d_state}, g_tx, d_tx
    )
    step = make_gan_train_step(model)
    for i in range(n):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
    return state, metrics


class TestCloudGAN:
    def test_runet_generator_mode(self, rng):
        model = create_model(
            "cloudgan", forecast_steps=2, input_channels=2,
            channels_per_timestep=2, num_filters=4, features_start=4,
            unet_depth=2, discriminator_model="enhanced",
        )
        batch = _tiny_batch()
        state, metrics = _run_gan_steps(model, batch, rng)
        assert _finite(metrics["g_loss"]) and _finite(metrics["d_loss"])

    def test_condition_time_mode(self, rng):
        model = create_model(
            "cloudgan", forecast_steps=2, input_channels=2,
            channels_per_timestep=2, num_filters=4, features_start=4,
            unet_depth=2, condition_time=True,
        )
        batch = _tiny_batch()
        state, metrics = _run_gan_steps(model, batch, rng, n=1)
        assert _finite(metrics["g_loss"]) and _finite(metrics["d_loss"])

    def test_convlstm_generator_mode(self, rng):
        model = create_model(
            "cloudgan", forecast_steps=2, input_channels=2,
            channels_per_timestep=2, num_filters=4, generator_model="convlstm",
        )
        batch = _tiny_batch()
        state, metrics = _run_gan_steps(model, batch, rng, n=1)
        assert _finite(metrics["g_loss"])


class TestPix2Pix:
    def test_train_steps(self, rng):
        model = create_model(
            "pix2pix", forecast_steps=2, input_channels=2,
            channels_per_timestep=2, num_filters=2,
            generator_model="resnet_6blocks", discriminator_model="n_layers",
            discriminator_layers=2,  # 16px inputs: 3 layers collapse the patch map
        )
        batch = _tiny_batch()
        state, metrics = _run_gan_steps(model, batch, rng)
        assert _finite(metrics["g_loss"]) and _finite(metrics["d_loss"])
        assert int(state.step) == 2
