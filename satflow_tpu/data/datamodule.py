"""SatFlowDataModule: loaders with background prefetch feeding sharded HBM tensors.

Reimplements reference satflow/data/datamodules.py:29-154 for TPU: instead of
torch DataLoader workers + pin_memory, a thread-pool prefetcher overlaps batch-file
reads/decodes with device compute, and each batch is ``jax.device_put`` with a
``NamedSharding`` (batch dim over the mesh's ``data`` axis) so arrays land already
sharded in HBM — the host→device boundary of reference datamodules.py:87-96.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, Optional, Sequence

from satflow_tpu.data import consts
from satflow_tpu.data.datasets import SatFlowDataset
from satflow_tpu.data.fake import FakeDataset


class _WorkerError:
    """Exception captured in a reader thread, re-raised at the consumer."""

    def __init__(self, error: BaseException):
        self.error = error


class Prefetcher:
    """Iterate a dataset with ``num_workers`` reader threads and a bounded queue."""

    def __init__(self, dataset, num_workers: int = 2, prefetch: int = 4, device_put=None):
        self.dataset = dataset
        self.num_workers = max(0, num_workers)
        self.prefetch = prefetch
        self.device_put = device_put

    def __len__(self):
        return len(self.dataset)

    def __iter__(self) -> Iterator:
        if self.num_workers == 0:
            for i in range(len(self.dataset)):
                yield self._convert(self.dataset[i])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        n = len(self.dataset)
        index_lock = threading.Lock()
        next_index = [0]
        results = {}
        results_cv = threading.Condition()

        def worker():
            while True:
                with index_lock:
                    i = next_index[0]
                    if i >= n:
                        return
                    next_index[0] += 1
                try:
                    item = self.dataset[i]
                except BaseException as e:  # noqa: BLE001 - delivered to consumer
                    item = _WorkerError(e)
                with results_cv:
                    results[i] = item
                    results_cv.notify_all()

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        for i in range(n):
            with results_cv:
                while i not in results:
                    results_cv.wait()
                item = results.pop(i)
            if isinstance(item, _WorkerError):
                raise item.error
            yield self._convert(item)

    def _convert(self, item):
        if self.device_put is not None:
            return self.device_put(item)
        return item


class SatFlowDataModule:
    """Train/val/test loader factory (reference datamodules.py:29-154 surface)."""

    def __init__(
        self,
        temp_path: str = ".",
        data_path: str = "",
        n_train_data: int = 24900,
        n_val_data: int = 1000,
        cloud: str = "local",
        num_workers: int = 2,
        prefetch_factor: int = 4,
        pin_memory: bool = True,  # accepted for config parity; devices put instead
        configuration_filename: str = "",
        fake_data: bool = False,
        fake_kwargs: Optional[dict] = None,
        required_keys: Sequence[str] = consts.DEFAULT_REQUIRED_KEYS,
        history_minutes: Optional[int] = None,
        forecast_minutes: Optional[int] = None,
        shard: bool = True,
    ):
        self.temp_path = temp_path
        self.data_path = data_path
        self.n_train_data = n_train_data
        self.n_val_data = n_val_data
        self.cloud = cloud
        self.num_workers = num_workers
        self.prefetch_factor = prefetch_factor
        self.fake_data = fake_data
        self.fake_kwargs = fake_kwargs or {}
        self.required_keys = list(required_keys)
        self.history_minutes = history_minutes
        self.forecast_minutes = forecast_minutes
        self.shard = shard
        self.configuration = self._load_configuration(configuration_filename)

    @staticmethod
    def _load_configuration(filename: str) -> dict:
        if not filename or not os.path.exists(filename):
            return {}
        import yaml

        with open(filename) as f:
            return yaml.safe_load(f) or {}

    def _device_put(self):
        if not self.shard:
            return None
        from satflow_tpu.parallel.mesh import shard_batch

        return lambda item: tuple(shard_batch(part) for part in item)

    def _dataset(self, split: str, n: int):
        if self.fake_data:
            return FakeDataset(
                history_minutes=self.history_minutes,
                forecast_minutes=self.forecast_minutes,
                length=min(n, 10),
                **self.fake_kwargs,
            )
        return SatFlowDataset(
            n,
            os.path.join(self.data_path, split),
            os.path.join(self.temp_path, split),
            configuration=self.configuration,
            cloud=self.cloud,
            required_keys=self.required_keys,
            history_minutes=self.history_minutes,
            forecast_minutes=self.forecast_minutes,
        )

    def train_dataloader(self) -> Prefetcher:
        return Prefetcher(
            self._dataset("train", self.n_train_data),
            num_workers=self.num_workers,
            prefetch=self.prefetch_factor,
            device_put=self._device_put(),
        )

    def val_dataloader(self) -> Prefetcher:
        return Prefetcher(
            self._dataset("validation", self.n_val_data),
            num_workers=self.num_workers,
            prefetch=self.prefetch_factor,
            device_put=self._device_put(),
        )

    def test_dataloader(self) -> Prefetcher:
        return Prefetcher(
            self._dataset("test", self.n_val_data),
            num_workers=self.num_workers,
            prefetch=self.prefetch_factor,
            device_put=self._device_put(),
        )
