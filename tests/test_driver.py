"""Experiment-driver tests: train(config) end-to-end wiring."""

import os

import numpy as np
import pytest

from satflow_tpu.core.config import compose, default_config_dir
from satflow_tpu.core.utils import extras
from satflow_tpu.experiments.train import train


def test_train_driver_end_to_end(tmp_path, monkeypatch):
    """Full driver path: compose → instantiate → fit → test → metric."""
    monkeypatch.chdir(tmp_path)
    cfg = compose(
        default_config_dir(),
        overrides=[
            "model.hidden_dim=4", "model.forecast_steps=2",
            "model.out_channels=12", "model.input_channels=12",
            "datamodule.history_minutes=15", "datamodule.forecast_minutes=10",
            "trainer=debug", "trainer.max_epochs=1", "~logger",
        ],
    )
    cfg = extras(cfg)
    result = train(cfg)
    assert result is not None and np.isfinite(result)  # optimized_metric val/loss
    assert os.path.exists("checkpoints/best")
    assert os.path.exists("artifacts/final")


def test_sweep_driver_tpe_end_to_end(tmp_path, monkeypatch):
    """--multirun path: hparams_search composes, TPE sweeps trials through
    train(), results.json records the best params/value."""
    import json

    from satflow_tpu.experiments.sweep import sweep

    monkeypatch.chdir(tmp_path)
    cfg = compose(
        default_config_dir(),
        overrides=[
            "model.hidden_dim=4", "model.forecast_steps=2",
            "model.out_channels=12", "model.input_channels=12",
            "datamodule.history_minutes=15", "datamodule.forecast_minutes=10",
            "trainer=debug", "trainer.max_epochs=1", "~logger",
            "+hparams_search=convlstm_optuna",
            "hparams_search.n_trials=2",
            "hparams_search.n_startup_trials=1",
        ],
    )
    cfg = extras(cfg)
    # shrink the categorical space so both trials share the tiny model size
    cfg["hparams_search"]["search_space"]["model.hidden_dim"]["choices"] = [4]
    best = sweep(cfg)
    assert np.isfinite(best)
    with open("logs/sweeps/results.json") as f:
        results = json.load(f)
    assert len(results["trials"]) == 2
    assert "model.lr" in results["best_params"]


def test_experiment_example_simple_composes_and_trains(tmp_path, monkeypatch):
    """The template-example overlay (group overrides + param overwrites) runs
    — unlike the reference's, which targets nonexistent MNIST modules."""
    monkeypatch.chdir(tmp_path)
    cfg = compose(
        default_config_dir(),
        overrides=[
            "+experiment=example_simple",
            "trainer.fast_dev_run=true",
            "datamodule.history_minutes=15", "datamodule.forecast_minutes=10",
            "model.forecast_steps=2", "model.input_channels=12",
            "model.out_channels=12",
        ],
    )
    assert cfg["seed"] == 12345 and cfg["model"]["hidden_dim"] == 16
    cfg = extras(cfg)
    result = train(cfg)
    assert result is not None and np.isfinite(result)


def test_experiment_example_full_inline_definitions(tmp_path, monkeypatch):
    """example_full: every group overridden to null, all modules defined
    inline with _target_ paths in ONE file (the reference template's
    all-in-one-config surface, made runnable)."""
    monkeypatch.chdir(tmp_path)
    cfg = compose(
        default_config_dir(),
        overrides=[
            "+experiment=example_full",
            "trainer.fast_dev_run=true",
            "datamodule.history_minutes=15", "datamodule.forecast_minutes=20",
        ],
    )
    assert cfg["model"]["_target_"].endswith("EncoderDecoderConvLSTM")
    assert cfg["trainer"]["accumulate_grad_batches"] == 2
    assert "model_checkpoint" in cfg["callbacks"]
    cfg = extras(cfg)
    result = train(cfg)
    assert result is not None and np.isfinite(result)


@pytest.mark.slow
def test_run_cli_multirun_flag(tmp_path, monkeypatch):
    """run.main(['--multirun', ...]) enters the sweep branch end to end."""
    from satflow_tpu.run import main as run_main

    monkeypatch.chdir(tmp_path)
    result = run_main([
        "--multirun",
        "model.hidden_dim=4", "model.forecast_steps=2",
        "model.out_channels=12", "model.input_channels=12",
        "datamodule.history_minutes=15", "datamodule.forecast_minutes=10",
        "trainer=debug", "trainer.max_epochs=1", "~logger",
        "print_config=false",
        "+hparams_search=convlstm_optuna",
        "hparams_search.n_trials=1",
        "hparams_search.n_startup_trials=1",
    ])
    assert result is not None and np.isfinite(result)
