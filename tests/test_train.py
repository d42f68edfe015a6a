"""Training-engine tests: end-to-end fit on fake data, loss decreases, checkpoints."""

import os

import jax
import numpy as np
import pytest

from satflow_tpu.core.registry import create_model
from satflow_tpu.data.datamodule import SatFlowDataModule
from satflow_tpu.data.fake import AdvectionDataset
from satflow_tpu.train.callbacks import EarlyStopping, ModelCheckpoint
from satflow_tpu.train.engine import Trainer
import satflow_tpu.models  # noqa: F401


class AdvectionDataModule(SatFlowDataModule):
    """Datamodule over the synthetic advection set (learnable signal)."""

    def __init__(self, **kwargs):
        super().__init__(fake_data=True, num_workers=0, shard=False, **kwargs)

    def _dataset(self, split, n):
        return AdvectionDataset(
            batch_size=4, width=16, height=16, number_sat_channels=2,
            history_minutes=15, forecast_minutes=10, length=6, seed=0,
        )


def _small_model():
    return create_model(
        "encoderdecoderconvlstm",
        input_channels=2,
        out_channels=2,
        forecast_steps=2,
        hidden_dim=8,
        lr=5e-3,
    )


def test_fit_loss_decreases(tmp_path):
    model = _small_model()
    dm = AdvectionDataModule()
    trainer = Trainer(max_epochs=4, log_every_n_steps=1, seed=0)
    trainer.fit(model, dm)
    hist = [h for h in trainer.history.history if "train/loss" in h]
    assert len(hist) >= 8
    first = np.mean([h["train/loss"] for h in hist[:3]])
    last = np.mean([h["train/loss"] for h in hist[-3:]])
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_fast_dev_run():
    model = _small_model()
    dm = AdvectionDataModule()
    trainer = Trainer(fast_dev_run=True)
    metrics = trainer.fit(model, dm)
    assert "train/loss" in metrics and "val/loss" in metrics


def test_checkpoint_and_resume(tmp_path):
    ckpt_dir = str(tmp_path / "ckpts")
    model = _small_model()
    dm = AdvectionDataModule()
    trainer = Trainer(
        max_epochs=1,
        callbacks=[ModelCheckpoint(monitor="val/loss", dirpath=ckpt_dir)],
        seed=0,
    )
    trainer.fit(model, dm)
    assert os.path.exists(os.path.join(ckpt_dir, "best"))
    assert os.path.exists(os.path.join(ckpt_dir, "last"))

    # load model from checkpoint (the "local:" registry source)
    from satflow_tpu.core.registry import create_model as cm

    loaded = cm(f"local:{os.path.join(ckpt_dir, 'best')}")
    assert loaded.restored_variables is not None
    x, _ = loaded.prepare_batch(dm.train_dataloader().dataset[0])
    y_hat = loaded.forward(loaded.restored_variables, jax.numpy.asarray(x))
    assert y_hat.shape[1] == 2

    # resume training from the checkpoint
    model2 = _small_model()
    trainer2 = Trainer(
        max_epochs=1, resume_from_checkpoint=os.path.join(ckpt_dir, "last"), seed=0
    )
    trainer2.fit(model2, dm)
    assert "train/loss" in trainer2.callback_metrics


def test_resume_restores_opt_state_and_step(tmp_path):
    """Resume must restore Adam moments + step counter (ADVICE r1 medium), not
    just weights — matching Lightning's resume_from_checkpoint semantics."""
    from satflow_tpu.train.checkpoint import resume_state, save_checkpoint

    ckpt = str(tmp_path / "ck")
    model = _small_model()
    dm = AdvectionDataModule()
    trainer = Trainer(max_epochs=1, seed=0)
    trainer.fit(model, dm)
    steps_done = trainer.global_step
    assert steps_done > 0
    save_checkpoint(ckpt, trainer.state, model)

    # Fresh state, then resume into it.
    model2 = _small_model()
    trainer2 = Trainer(max_epochs=0, seed=0)
    trainer2.resume_from_checkpoint = ckpt
    trainer2.fit(model2, dm)  # max_epochs=0: builds + resumes, runs no steps
    assert trainer2.global_step == steps_done
    assert int(jax.device_get(trainer2.state.step)) == steps_done

    # Adam moments actually restored (non-zero and equal to the saved ones).
    def flat(tree):
        return np.concatenate(
            [np.ravel(np.asarray(x)) for x in jax.tree_util.tree_leaves(tree)]
        )

    saved = flat(jax.device_get(trainer.state.opt_state))
    restored = flat(jax.device_get(trainer2.state.opt_state))
    assert saved.shape == restored.shape
    np.testing.assert_allclose(saved, restored, rtol=1e-6)
    assert np.any(saved != 0.0), "opt_state moments are all-zero (not trained?)"


def test_gan_checkpoint_saves_both_opt_states(tmp_path):
    from satflow_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    model = create_model(
        "cloudgan", forecast_steps=2, input_channels=2, channels_per_timestep=2,
        num_filters=4, features_start=4, unet_depth=2, lr=1e-3,
    )
    dm = AdvectionDataModule()
    trainer = Trainer(max_epochs=1, limit_train_batches=2, limit_val_batches=1, seed=0)
    trainer.fit(model, dm)
    ckpt = str(tmp_path / "gan_ck")
    save_checkpoint(ckpt, trainer.state, model)
    payload = restore_checkpoint(ckpt)
    assert "generator" in payload["opt_state"]
    assert "discriminator" in payload["opt_state"]
    assert payload["step"] == trainer.global_step

    # Round-trip through resume_state preserves structure.
    from satflow_tpu.train.checkpoint import resume_state

    state2, step = resume_state(trainer.state, ckpt)
    assert step == trainer.global_step


def test_plateau_scheduler_clamps_at_min_lr():
    from satflow_tpu.train.schedules import PlateauScheduler

    s = PlateauScheduler(base_lr=1e-3, factor=0.1, patience=0, min_lr=1e-5)
    s.update(1.0)  # best
    for _ in range(5):
        s.update(2.0)  # plateau -> decay each time
    assert s.lr == pytest.approx(1e-5)  # clamped at min_lr, not min_lr*base_lr


def test_rewrite_learning_rate_through_wrappers():
    import jax.numpy as jnp
    import optax

    from satflow_tpu.train.schedules import rewrite_learning_rate

    tx = optax.MultiSteps(
        optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.inject_hyperparams(optax.adam)(learning_rate=1e-3),
        ),
        every_k_schedule=2,
    )
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    new_state = rewrite_learning_rate(state, 5e-4)

    def find_lr(node):
        hp = getattr(node, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            return float(hp["learning_rate"])
        if isinstance(node, tuple):
            for c in node:
                got = find_lr(c)
                if got is not None:
                    return got
        if hasattr(node, "_fields"):
            for f in node._fields:
                got = find_lr(getattr(node, f))
                if got is not None:
                    return got
        return None

    assert find_lr(new_state) == pytest.approx(5e-4)
    # structure unchanged: the jitted step won't recompile
    assert jax.tree_util.tree_structure(state) == jax.tree_util.tree_structure(new_state)


def test_gan_plateau_reduces_lr_in_opt_state():
    """scheduler='plateau' wiring: stalled val metrics rewrite the injected LR
    (ADVICE r1: scheduler arg was stored but never used)."""
    model = create_model(
        "cloudgan", forecast_steps=2, input_channels=2, channels_per_timestep=2,
        num_filters=4, features_start=4, unet_depth=2, scheduler="plateau",
        lr=1e-3, lr_epochs=0,
    )
    dm = AdvectionDataModule()
    trainer = Trainer(max_epochs=1, limit_train_batches=1, limit_val_batches=1, seed=0)
    trainer.fit(model, dm)
    assert trainer._plateau is not None
    # simulate stalled validations
    trainer._plateau_step({"val/g_loss": 1.0})
    before = trainer._plateau.scale
    trainer._plateau_step({"val/g_loss": 2.0})
    trainer._plateau_step({"val/g_loss": 2.0})
    assert trainer._plateau.scale < before

    def find_lr(node):
        hp = getattr(node, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            return float(hp["learning_rate"])
        if isinstance(node, tuple):
            for c in node:
                got = find_lr(c)
                if got is not None:
                    return got
        if hasattr(node, "_fields"):
            for f in node._fields:
                got = find_lr(getattr(node, f))
                if got is not None:
                    return got
        return None

    assert find_lr(trainer.state.g_opt_state) == pytest.approx(trainer._plateau.lr)


def test_gan_cosine_scheduler_decays_lr():
    import jax.numpy as jnp
    import optax

    model = create_model(
        "cloudgan", forecast_steps=2, input_channels=2, channels_per_timestep=2,
        num_filters=4, features_start=4, unet_depth=2, scheduler="cosine",
        lr=1e-3,
    )
    model.total_steps = 10
    g_tx, _ = model.make_optimizers()
    params = {"w": jnp.ones((3,))}
    state = g_tx.init(params)
    lrs = []
    for _ in range(3):
        _, state = g_tx.update({"w": jnp.ones((3,))}, state, params)
        lrs.append(float(state.hyperparams["learning_rate"]))
    assert lrs[0] > lrs[-1], lrs


def test_gan_hparams_roundtrip():
    """GAN checkpoints must rebuild with the right GAN mode / criterion names."""
    model = create_model(
        "cloudgan", forecast_steps=2, input_channels=2, channels_per_timestep=2,
        loss="lsgan", l1_loss="l1", num_filters=4, features_start=4, unet_depth=2,
    )
    hp = model.hparams()
    assert hp["loss"] == "lsgan" and hp["l1_loss"] == "l1"
    from satflow_tpu.train.checkpoint import _ctor_kwargs

    rebuilt = create_model("cloudgan", **_ctor_kwargs("CloudGAN", {k: v for k, v in hp.items() if k != "class"}))
    assert rebuilt.gan_mode == "lsgan"

    p2p = create_model("pix2pix", forecast_steps=2, input_channels=2,
                       channels_per_timestep=2, num_filters=2, loss="vanilla")
    assert p2p.hparams()["loss"] == "vanilla"


def test_early_stopping():
    model = _small_model()
    dm = AdvectionDataModule()
    trainer = Trainer(
        max_epochs=20,
        callbacks=[EarlyStopping(monitor="val/loss", patience=0, min_delta=10.0)],
        seed=0,
    )
    trainer.fit(model, dm)
    # patience 0 + impossible min_delta: stops right after first 2 validations
    assert trainer.global_step < 20 * 6


def test_gan_fit_through_engine():
    """Two-optimizer GAN training through Trainer.fit (reference cloudgan flow)."""
    model = create_model(
        "cloudgan", forecast_steps=2, input_channels=2,
        channels_per_timestep=2, num_filters=4, features_start=4,
        unet_depth=2, discriminator_model="enhanced",
    )

    class DM(AdvectionDataModule):
        def _dataset(self, split, n):
            return AdvectionDataset(
                batch_size=2, width=16, height=16, number_sat_channels=2,
                history_minutes=15, forecast_minutes=10, length=2, seed=0,
            )

    trainer = Trainer(max_epochs=1, log_every_n_steps=1, seed=0)
    metrics = trainer.fit(model, DM())
    assert np.isfinite(metrics["train/g_loss"])
    assert np.isfinite(metrics["train/d_loss"])
    assert "val/g_loss" in metrics


def test_bf16_precision_flag():
    """trainer precision bf16 swaps the module's compute dtype."""
    import jax.numpy as jnp

    model = _small_model()
    dm = AdvectionDataModule()
    trainer = Trainer(fast_dev_run=True, precision="bf16")
    metrics = trainer.fit(model, dm)
    assert model.dtype == jnp.bfloat16
    assert np.isfinite(metrics["train/loss"])


def test_overfit_batches_uses_same_data():
    model = _small_model()
    dm = AdvectionDataModule()
    trainer = Trainer(max_epochs=2, overfit_batches=1, log_every_n_steps=1, seed=0)
    metrics = trainer.fit(model, dm)
    assert trainer.global_step == 2  # one cached batch × two epochs
    assert np.isfinite(metrics["val/loss"])


def test_scale_batch_size_backs_off_on_failure():
    """auto_scale_batch_size: doubles until failure, keeps the last good size
    (reference trainer.tune(auto_scale_batch_size), train.py:81-83)."""
    model = _small_model()
    dm = AdvectionDataModule()
    orig = model.init_variables

    def failing_init(rng, batch):
        x, _ = batch
        if x["sat_data"].shape[0] > 4:
            raise RuntimeError("RESOURCE_EXHAUSTED: fake OOM")
        return orig(rng, batch)

    model.init_variables = failing_init
    trainer = Trainer(seed=0)
    n = trainer.scale_batch_size(model, dm, init_val=2, max_trials=5)
    assert n == 4


def test_scale_batch_size_grows_and_sets_attr():
    model = _small_model()
    dm = AdvectionDataModule()
    dm.batch_size = 0
    trainer = Trainer(seed=0)
    n = trainer.scale_batch_size(model, dm, init_val=2, max_trials=3,
                                 max_batch_size=8)
    assert n == 8  # 2 -> 4 -> 8, capped by max_batch_size
    assert dm.batch_size == 8


def test_neptune_logger_offline_noop_and_mock():
    """NeptuneLogger: silent no-op offline; logs through a mocked client."""
    from satflow_tpu.train.loggers import NeptuneLogger

    lg = NeptuneLogger(project="none/nothing")
    lg.log_metrics({"train/loss": 1.0}, step=1)  # no client: must not raise
    lg.finalize()

    class FakeSeries:
        def __init__(self):
            self.values = []

        def append(self, v, step=None):
            self.values.append((v, step))

    class FakeRun(dict):
        def __init__(self):
            super().__init__()
            self.stopped = False

        def __getitem__(self, k):
            return self.setdefault(k, FakeSeries()) if k not in self else super().__getitem__(k)

        def setdefault(self, k, v):
            if k not in self:
                super().__setitem__(k, v)
            return super().__getitem__(k)

        def stop(self):
            self.stopped = True

    lg2 = NeptuneLogger(project="none/nothing")
    lg2._run = FakeRun()
    lg2.log_metrics({"train/loss": 0.5, "val/loss": 0.7}, step=3)
    assert lg2._run["train/loss"].values == [(0.5, 3)]
    assert lg2._run["val/loss"].values == [(0.7, 3)]
    lg2.finalize()
    assert lg2._run.stopped


def test_tune_lr_finder():
    model = _small_model()
    dm = AdvectionDataModule()
    trainer = Trainer(seed=0)
    old_lr = model.lr
    suggestion = trainer.tune(model, dm, num_steps=8)
    assert suggestion > 0 and model.lr == suggestion
    assert suggestion != old_lr or True  # may coincide; just must be finite
    assert np.isfinite(suggestion)


def test_sweep_runs_trials(tmp_path):
    from satflow_tpu.experiments.sweep import sweep

    config = {
        "seed": 0,
        "sweep_dir": str(tmp_path),
        "datamodule": {
            "_target_": "tests.test_train.AdvectionDataModule",
        },
        "model": {
            "_target_": "satflow_tpu.models.conv_lstm.EncoderDecoderConvLSTM",
            "input_channels": 2, "out_channels": 2, "forecast_steps": 2,
            "hidden_dim": 4,
        },
        "trainer": {"fast_dev_run": True},
        "optimized_metric": "val/loss",
        "hparams_search": {
            "n_trials": 2,
            "optimized_metric": "val/loss",
            "search_space": {
                "model.lr": {"type": "loguniform", "low": 1e-4, "high": 1e-2},
            },
        },
    }
    best = sweep(config)
    assert np.isfinite(best)
    import json, os

    results = json.load(open(os.path.join(str(tmp_path), "results.json")))
    assert len(results["trials"]) == 2


def test_grad_accumulation_and_clipping():
    model = _small_model()
    dm = AdvectionDataModule()
    trainer = Trainer(
        max_epochs=1, accumulate_grad_batches=2, gradient_clip_val=1.0, seed=0
    )
    metrics = trainer.fit(model, dm)
    assert np.isfinite(metrics["train/loss"])


def test_checkpoint_head_layout_adaptation(tmp_path):
    """A checkpoint saved with head_in_scan=False (the r1 top-level 'head'
    layout) must load into the head_in_scan=True default, and vice versa."""
    from satflow_tpu.train.checkpoint import save_checkpoint

    dm = AdvectionDataModule()
    old = create_model(
        "encoderdecoderconvlstm", input_channels=2, out_channels=2,
        forecast_steps=2, hidden_dim=8, head_in_scan=False,
    )
    trainer = Trainer(max_epochs=1, limit_train_batches=1, limit_val_batches=1, seed=0)
    trainer.fit(old, dm)
    ckpt = str(tmp_path / "old_layout")
    save_checkpoint(ckpt, trainer.state, old)

    # the saved hparams embed head_in_scan=False -> rebuild matches exactly;
    # force the cross-layout path by loading into a head_in_scan=True model.
    from satflow_tpu.train.checkpoint import restore_params_into

    new = create_model(
        "encoderdecoderconvlstm", input_channels=2, out_channels=2,
        forecast_steps=2, hidden_dim=8, head_in_scan=True,
    )
    restore_params_into(new, ckpt)
    assert "head" in new.restored_variables["params"]["decoder"]
    x, _ = new.prepare_batch(dm.train_dataloader().dataset[0])
    y_hat = new.forward(new.restored_variables, jax.numpy.asarray(x))
    # identical math across layouts: compare against the source model
    y_old = old.forward(
        {"params": trainer.state.params, **trainer.state.model_state},
        jax.numpy.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(y_hat), np.asarray(y_old), atol=2e-5)


def test_gan_plateau_scales_each_optimizer_lr():
    """Plateau decay scales gen_lr and disc_lr separately (review finding:
    the generator's decayed LR was clobbering the discriminator's)."""
    from satflow_tpu.train.schedules import PlateauScheduler

    model = create_model(
        "cloudgan", forecast_steps=2, input_channels=2, channels_per_timestep=2,
        num_filters=4, features_start=4, unet_depth=2, scheduler="plateau",
        lr=1e-3,
    )
    model.disc_lr = 4e-3  # distinct base LRs
    dm = AdvectionDataModule()
    trainer = Trainer(max_epochs=1, limit_train_batches=1, limit_val_batches=1, seed=0)
    trainer.fit(model, dm)
    trainer._plateau = PlateauScheduler(base_lr=1e-3, factor=0.5, patience=0)
    trainer._plateau_step({"val/g_loss": 1.0})
    trainer._plateau_step({"val/g_loss": 2.0})
    trainer._plateau_step({"val/g_loss": 2.0})

    def find_lr(node):
        hp = getattr(node, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            return float(hp["learning_rate"])
        if isinstance(node, tuple):
            for c in node:
                got = find_lr(c)
                if got is not None:
                    return got
        if hasattr(node, "_fields"):
            for f in node._fields:
                got = find_lr(getattr(node, f))
                if got is not None:
                    return got
        return None

    scale = trainer._plateau.scale
    assert scale < 1.0
    assert find_lr(trainer.state.g_opt_state) == pytest.approx(1e-3 * scale)
    assert find_lr(trainer.state.d_opt_state) == pytest.approx(4e-3 * scale)


def test_model_artifact_logger_saves_final_checkpoint(tmp_path):
    """ModelArtifactLogger (the reference NeptuneModelLogger's role,
    models/base.py stale-import defect fixed): a loadable final checkpoint
    lands in dirpath at train end."""
    from satflow_tpu.train.callbacks import ModelArtifactLogger

    art_dir = str(tmp_path / "artifacts")
    model = _small_model()
    trainer = Trainer(max_epochs=1, limit_train_batches=1, limit_val_batches=1,
                      callbacks=[ModelArtifactLogger(dirpath=art_dir)], seed=0)
    trainer.fit(model, AdvectionDataModule())
    final = os.path.join(art_dir, "final")
    assert os.path.exists(os.path.join(final, "hparams.json"))

    loaded = create_model(f"local:{final}")
    assert loaded.restored_variables is not None
    assert loaded.hidden_dim == model.hidden_dim


def test_preemption_sigterm_checkpoints_and_stops(tmp_path):
    """SIGTERM mid-fit (the TPU-VM/k8s preemption signal): the trainer
    finishes the in-flight step, writes an emergency `last` checkpoint with
    optimizer state + step counter, and fit returns cleanly — beyond the
    reference, which has no failure recovery (SURVEY §5.3)."""
    import signal as _signal

    from satflow_tpu.train.callbacks import Callback
    from satflow_tpu.train.checkpoint import restore_checkpoint

    ckpt_dir = str(tmp_path / "ckpts")

    class PreemptAtStep2(Callback):
        def on_train_batch_end(self, engine, metrics, step):
            if step == 2:
                os.kill(os.getpid(), _signal.SIGTERM)

    model = _small_model()
    dm = AdvectionDataModule()
    trainer = Trainer(
        max_epochs=50,
        callbacks=[PreemptAtStep2(), ModelCheckpoint(dirpath=ckpt_dir)],
        seed=0,
    )
    trainer.fit(model, dm)

    assert trainer.preempted and trainer.should_stop
    assert trainer.global_step <= 4  # stopped right after the signal
    last = os.path.join(ckpt_dir, "last")
    assert os.path.exists(last)
    payload = restore_checkpoint(last)
    assert int(payload["step"]) == trainer.global_step

    # the saved state resumes with the step counter intact
    model2 = _small_model()
    trainer2 = Trainer(max_epochs=0, resume_from_checkpoint=last, seed=0)
    trainer2.fit(model2, dm)
    assert trainer2.global_step == trainer.global_step
    # the default SIGTERM disposition is restored after fit
    assert _signal.getsignal(_signal.SIGTERM) == _signal.SIG_DFL


def test_training_is_deterministic_with_seed():
    """Two fits with the same seed produce identical parameters — the
    deterministic-seed discipline SURVEY §5.2 prescribes in place of
    sanitizers (threefry is partitionable+stable; data is seed-derived)."""
    import jax.tree_util as jtu

    def run():
        model = _small_model()
        dm = AdvectionDataModule()
        trainer = Trainer(max_epochs=1, seed=123)
        trainer.fit(model, dm)
        return jax.device_get(trainer.state.params)

    p1, p2 = run(), run()
    for a, b in zip(jtu.tree_leaves(p1), jtu.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
