"""Logger tests: CSV rows, TensorBoard events, history, image grids."""

import csv
import os

import numpy as np

from satflow_tpu.train.loggers import CSVLogger, HistoryLogger, TensorBoardLogger
from satflow_tpu.train.visualize import make_image_grid


def test_csv_logger_writes_rows(tmp_path):
    lg = CSVLogger(save_dir=str(tmp_path), name="run")
    for step in range(3):
        lg.log_metrics({"train/loss": 1.0 - 0.1 * step}, step)
    lg.log_hyperparams({"model": {"lr": 0.1}})
    lg.finalize()
    with open(os.path.join(str(tmp_path), "run", "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert float(rows[2]["train/loss"]) == 0.8
    assert os.path.exists(os.path.join(str(tmp_path), "run", "hparams.json"))


def test_tensorboard_logger_writes_events(tmp_path):
    lg = TensorBoardLogger(save_dir=str(tmp_path), name="run")
    lg.log_metrics({"train/loss": 0.5}, 1)
    lg.log_image("train/panel", np.zeros((4, 4, 3), np.float32), 1)
    lg.finalize()
    files = os.listdir(os.path.join(str(tmp_path), "run"))
    assert any("tfevents" in f for f in files)


def test_history_logger_latest():
    lg = HistoryLogger()
    lg.log_metrics({"a": 1.0}, 1)
    lg.log_metrics({"a": 2.0, "b": 3.0}, 2)
    assert lg.latest == {"a": 2.0, "b": 3.0}
    assert len(lg.history) == 2


def test_make_image_grid_shapes():
    frames = np.random.default_rng(0).random((5, 6, 7, 1)).astype(np.float32)
    grid = make_image_grid(frames, nrow=3, pad=1)
    assert grid.shape == (2 * 7, 3 * 8, 3)  # 2 rows × (6+1), 3 cols × (7+1), rgb
    assert grid.min() >= 0.0 and grid.max() <= 1.0


def test_csv_logger_appends_and_widens_schema(tmp_path):
    """Incremental appends (no O(n^2) rewrite) + on-disk schema widening when
    a later row introduces new metric keys (e.g. the first val epoch)."""
    lg = CSVLogger(save_dir=str(tmp_path), name="run")
    for step in range(120):  # crosses two 50-row flushes
        lg.log_metrics({"train/loss": float(step)}, step)
    lg.log_metrics({"train/loss": 120.0, "val/loss": 0.5}, 120)
    lg.finalize()
    path = os.path.join(str(tmp_path), "run", "metrics.csv")
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 121
    assert float(rows[60]["train/loss"]) == 60.0
    assert rows[60]["val/loss"] == ""      # widened column backfills empty
    assert float(rows[-1]["val/loss"]) == 0.5
    # memory stays bounded: flushed rows are not retained
    assert len(lg._pending) == 0 and lg._written == 121


def test_rank_zero_logging_gate_is_lazy():
    """get_logger must not touch the jax backend; the gate reacts to
    set_logging_process_index (called after jax.distributed init)."""
    import logging

    from satflow_tpu.core.utils import get_logger, set_logging_process_index

    logger = get_logger("satflow_tpu.test_rank_gate")
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = Capture()
    logger.addHandler(h)
    try:
        logger.info("rank0-visible")
        set_logging_process_index(3)
        logger.info("rank3-hidden")
        set_logging_process_index(0)
        logger.info("rank0-again")
    finally:
        logger.removeHandler(h)
        set_logging_process_index(0)
    assert records == ["rank0-visible", "rank0-again"]
