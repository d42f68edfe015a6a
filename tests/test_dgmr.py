"""DGMR / NowcastingGAN tests: blocks, generator rollout, dual-disc GAN step."""

import jax
import jax.numpy as jnp
import pytest

from satflow_tpu.core.registry import create_model
from satflow_tpu.data.fake import FakeDataset
from satflow_tpu.nn.dgmr_blocks import (
    ContextConditioningStack,
    DBlock,
    GBlock,
    LatentConditioningStack,
)
from satflow_tpu.train.state import GANTrainState
from satflow_tpu.train.steps import make_gan_train_step
import satflow_tpu.models  # noqa: F401

# every test here compiles a GAN step or trains a sampler — the slow tier
pytestmark = pytest.mark.slow


def _finite(x):
    return bool(jnp.all(jnp.isfinite(x)))


def _tiny_dgmr():
    return create_model(
        "nowcastinggan",
        forecast_steps=2,
        input_channels=1,
        output_shape=32,
        context_channels=16,
        latent_channels=32,
        disc_channels=4,
        disc_spatial_layers=2,
        disc_temporal_layers=1,
        num_samples=2,
    )


def _batch():
    ds = FakeDataset(batch_size=1, width=32, height=32, number_sat_channels=1,
                     history_minutes=15, forecast_minutes=10, length=1)
    return ds[0]


class TestBlocks:
    def test_gblock_upsample(self, rng):
        x = jax.random.normal(rng, (1, 4, 4, 8))
        block = GBlock(16, upsample=True)
        variables = block.init(rng, x)
        y, _ = block.apply(variables, x, True, mutable=["batch_stats", "spectral"])
        assert y.shape == (1, 8, 8, 16) and _finite(y)

    def test_dblock_downsample(self, rng):
        x = jax.random.normal(rng, (1, 8, 8, 4))
        block = DBlock(8)
        variables = block.init(rng, x)
        y, _ = block.apply(variables, x, mutable=["spectral"])
        assert y.shape == (1, 4, 4, 8) and _finite(y)

    def test_context_stack_scales(self, rng):
        x = jax.random.normal(rng, (1, 3, 32, 32, 1))
        stack = ContextConditioningStack(scale_channels=(4, 8, 16, 32))
        variables = stack.init(rng, x)
        ctx, _ = stack.apply(variables, x, mutable=["spectral"])
        assert [c.shape for c in ctx] == [
            (1, 8, 8, 4), (1, 4, 4, 8), (1, 2, 2, 16), (1, 1, 1, 32)
        ]

    def test_latent_stack(self, rng):
        stack = LatentConditioningStack(latent_channels=32)
        variables = stack.init(rng, rng, 2, 2, 2)
        z, _ = stack.apply(variables, rng, 2, 2, 2, mutable=["spectral"])
        assert z.shape == (2, 2, 2, 32) and _finite(z)


def test_generator_rollout_shape(rng):
    model = _tiny_dgmr()
    batch = _batch()
    x, y = model.prepare_batch(batch)
    assert x.shape == (1, 4, 32, 32, 1)
    g_vars, d_vars = model.init_gan_variables(rng, batch)
    y_hat, _ = model._sample(g_vars, x, rng, False, 1)
    assert y_hat.shape == (1, 1, 2, 32, 32, 1)
    assert _finite(y_hat)


def test_crps_finetune_improves_fair_crps(rng):
    """Generator-only fair-CRPS fine-tune (train/probabilistic.py): the loss
    must drop over a short run, non-param collections stay frozen, and the
    M<2 misuse raises (fair CRPS is undefined for a deterministic forecast)."""
    from satflow_tpu.data.fake import StochasticAdvectionDataset
    from satflow_tpu.train.probabilistic import crps_finetune

    model = _tiny_dgmr()
    ds = StochasticAdvectionDataset(
        batch_size=2, width=32, height=32, number_sat_channels=1,
        history_minutes=15, forecast_minutes=10, length=2, seed=0,
    )
    g_vars, _ = model.init_gan_variables(rng, ds[0])

    new_vars, hist = crps_finetune(
        model, g_vars, [ds[0], ds[1]], steps=12, num_samples=3, lr=2e-3,
        log_every=4,
    )
    assert len(hist) >= 3 and all(jnp.isfinite(jnp.asarray(hist)))
    assert hist[-1] < hist[0]  # the proper score improves
    # params moved, frozen collections did not
    changed = jax.tree_util.tree_reduce(
        lambda a, b: a or b,
        jax.tree_util.tree_map(
            lambda a, b: bool(jnp.any(a != b)),
            g_vars["params"], new_vars["params"]),
    )
    assert changed
    for k in g_vars:
        if k != "params":
            assert jax.tree_util.tree_all(jax.tree_util.tree_map(
                lambda a, b: bool(jnp.all(a == b)), g_vars[k], new_vars[k]))

    with pytest.raises(ValueError):
        crps_finetune(model, g_vars, [ds[0]], steps=1, num_samples=1)


def test_dgmr_gan_step(rng):
    model = _tiny_dgmr()
    batch = _batch()
    g_vars, d_vars = model.init_gan_variables(rng, batch)
    g_params, g_state = model.split_variables(g_vars)
    d_params, d_state = model.split_variables(d_vars)
    g_tx, d_tx = model.make_optimizers()
    state = GANTrainState.create(
        g_params, d_params, {"g": g_state, "d": d_state}, g_tx, d_tx
    )
    step = make_gan_train_step(model)
    state, metrics = step(state, batch, rng)
    assert _finite(metrics["g_loss"]) and _finite(metrics["d_loss"])
    assert _finite(metrics["g_grid_reg"])


def test_dgmr_split_step_matches_fused(rng):
    """Split D/G jits (gan_step_mode='split', the DGMR-at-scale compile
    lever) must be numerically equivalent to the fused single-program step:
    identical rng derivation, same op sequence, only program boundaries
    differ. Two steps chained through donated state, dual-disc (disc_steps=2)
    exercised. Reference parity anchor: cloudgan.py:244-248 (Lightning's two
    optimizer closures are the split shape)."""
    model = _tiny_dgmr()
    model.disc_steps = 2
    batch = _batch()

    def run(mode):
        g_vars, d_vars = model.init_gan_variables(rng, batch)
        g_params, g_state = model.split_variables(g_vars)
        d_params, d_state = model.split_variables(d_vars)
        g_tx, d_tx = model.make_optimizers()
        state = GANTrainState.create(
            g_params, d_params, {"g": g_state, "d": d_state}, g_tx, d_tx
        )
        step = make_gan_train_step(model, mode=mode)
        r = rng
        for _ in range(2):
            r, sub = jax.random.split(r)
            state, metrics = step(state, batch, sub)
        return state, metrics

    fused_state, fused_m = run("fused")
    split_state, split_m = run("split")
    # step counts one per D application (disc_steps=2 x 2 rounds = 4)
    assert int(split_state.step) == int(fused_state.step) == 4
    for a, b in zip(jax.tree_util.tree_leaves(fused_state.g_params),
                    jax.tree_util.tree_leaves(split_state.g_params)):
        assert jnp.allclose(a, b, atol=1e-5), "generator params diverged"
    for a, b in zip(jax.tree_util.tree_leaves(fused_state.d_params),
                    jax.tree_util.tree_leaves(split_state.d_params)):
        assert jnp.allclose(a, b, atol=1e-5), "discriminator params diverged"
    for k in ("g_loss", "d_loss"):
        assert jnp.allclose(fused_m[k], split_m[k], atol=1e-5), k
    assert bool(split_m["finite"])

    with pytest.raises(ValueError):
        make_gan_train_step(model, mode="both")
