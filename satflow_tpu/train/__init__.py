"""Training engine: states, jitted steps, fit/test loops, callbacks, loggers."""

from satflow_tpu.train.engine import Trainer  # noqa: F401
from satflow_tpu.train.state import TrainState  # noqa: F401
