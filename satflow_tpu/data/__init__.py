"""Data layer: batch stores, datasets, fake backend, datamodule, transforms."""

from satflow_tpu.data import consts  # noqa: F401
from satflow_tpu.data.datamodule import Prefetcher, SatFlowDataModule  # noqa: F401
from satflow_tpu.data.datasets import (  # noqa: F401
    NpzBatchStore,
    SatFlowDataset,
    write_fake_store,
)
from satflow_tpu.data.fake import AdvectionDataset, FakeDataset  # noqa: F401
