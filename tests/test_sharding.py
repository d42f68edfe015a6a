"""Multi-device tests on the virtual 8-CPU mesh: DP train step, sharded batches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from satflow_tpu.core.registry import create_model
from satflow_tpu.data.fake import FakeDataset
from satflow_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    replicated_sharding,
    shard_batch,
)
from satflow_tpu.train.state import TrainState
from satflow_tpu.train.steps import make_train_step
import satflow_tpu.models  # noqa: F401


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")


def test_shard_batch_places_on_data_axis(mesh):
    ds = FakeDataset(batch_size=8, width=8, height=8, length=1)
    x, y = ds[0]
    sx, sy = shard_batch(x), shard_batch(y)
    sat = sx["sat_data"]
    assert sat.sharding.spec[0] == "data"
    np.testing.assert_allclose(np.asarray(sat), x["sat_data"], atol=0)


def test_dp_train_step_runs_sharded(mesh, rng):
    """A full train step over an 8-way sharded batch compiles and executes."""
    model = create_model(
        "encoderdecoderconvlstm", input_channels=12, out_channels=12,
        forecast_steps=2, hidden_dim=8,
    )
    ds = FakeDataset(batch_size=8, width=8, height=8, history_minutes=15,
                     forecast_minutes=10, length=1)
    batch = ds[0]
    variables = model.init_variables(rng, batch)
    params, state = model.split_variables(variables)
    params = jax.device_put(params, replicated_sharding(mesh))
    import optax

    ts = TrainState.create(params, state, optax.adam(1e-3))
    sharded_batch = tuple(shard_batch(part, mesh) for part in batch)
    step = make_train_step(model)
    new_state, metrics = step(ts, sharded_batch, rng)
    assert jnp.isfinite(metrics["loss"])
    # grads were averaged over the full global batch: params stay in sync
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert bool(jnp.all(jnp.isfinite(leaf)))


def test_zero_sharded_fit(mesh):
    """Trainer with zero_sharding: opt state scattered, training still works."""
    from tests.test_train import AdvectionDataModule, _small_model
    from satflow_tpu.train.engine import Trainer

    model = _small_model()
    trainer = Trainer(fast_dev_run=True, zero_sharding=True, seed=0)
    metrics = trainer.fit(model, AdvectionDataModule())
    assert np.isfinite(metrics["train/loss"])
    # at least one opt-state leaf is actually sharded over `data`
    leaves = jax.tree_util.tree_leaves(trainer.state.opt_state)
    assert any(
        getattr(x, "sharding", None) is not None
        and getattr(x.sharding, "spec", ()) != ()
        and "data" in str(x.sharding.spec)
        for x in leaves
    )


def test_dp_matches_single_device(mesh, rng):
    """Sharded-step loss equals the single-device loss on the same batch."""
    model = create_model(
        "encoderdecoderconvlstm", input_channels=12, out_channels=12,
        forecast_steps=2, hidden_dim=8,
    )
    ds = FakeDataset(batch_size=8, width=8, height=8, history_minutes=15,
                     forecast_minutes=10, length=1)
    batch = ds[0]
    variables = model.init_variables(rng, batch)
    params, state = model.split_variables(variables)
    loss_single, _ = model.loss(params, state, batch, rng, train=False)

    sharded_batch = tuple(shard_batch(part, mesh) for part in batch)
    params_rep = jax.device_put(params, replicated_sharding(mesh))
    loss_sharded, _ = jax.jit(
        lambda p, b: model.loss(p, state, b, rng, train=False)
    )(params_rep, sharded_batch)
    np.testing.assert_allclose(
        float(loss_single), float(loss_sharded), rtol=1e-5
    )
