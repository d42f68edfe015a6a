"""Data-layer tests: fake schema parity, batch store, past/future split."""

import numpy as np
import pytest

from satflow_tpu.data import consts
from satflow_tpu.data.datasets import SatFlowDataset, write_fake_store
from satflow_tpu.data.fake import AdvectionDataset, FakeDataset


def test_fake_dataset_schema():
    """Shapes must match reference satflow/data/datamodules.py:188-218."""
    ds = FakeDataset(batch_size=3, width=16, height=16, history_minutes=30,
                     forecast_minutes=240)
    x, y = ds[0]
    seq = 30 // 5 + 1
    assert x[consts.SATELLITE_DATA].shape == (3, seq, 16, 16, 12)
    assert x[consts.NWP_DATA].shape == (3, 10, seq, 2, 2)
    for name in consts.DATETIME_FEATURE_NAMES:
        assert x[name].shape == (3, seq)
    # coords sorted ascending (x) / descending (y)
    xc = x[consts.SATELLITE_X_COORDS]
    yc = x[consts.SATELLITE_Y_COORDS]
    assert np.all(np.diff(xc, axis=-1) >= 0)
    assert np.all(np.diff(yc, axis=-1) <= 0)
    assert y[consts.SATELLITE_DATA].shape == (3, 48, 16, 16, 12)


def test_fake_dataset_deterministic():
    ds = FakeDataset(batch_size=2, length=2, seed=7)
    x1, _ = ds[0]
    x2, _ = ds[0]
    np.testing.assert_array_equal(
        x1[consts.SATELLITE_DATA], x2[consts.SATELLITE_DATA]
    )


def test_advection_dataset_moves():
    ds = AdvectionDataset(batch_size=1, width=16, height=16, number_sat_channels=1,
                          history_minutes=15, forecast_minutes=10, velocity=(2, 1))
    x, y = ds[0]
    frames = x[consts.SATELLITE_DATA][0, :, :, :, 0]
    # frame 1 is frame 0 rolled by (2, 1)
    np.testing.assert_allclose(
        np.roll(np.roll(frames[0], 2, axis=0), 1, axis=1), frames[1], atol=1e-6
    )


def test_npz_store_and_split(tmp_path):
    """Past/future split parity with reference datasets.py:70-106."""
    path = str(tmp_path / "train")
    write_fake_store(path, n_batches=2, batch_size=2, size=8, seq_length=19)
    ds = SatFlowDataset(2, path, history_minutes=30, forecast_minutes=60)
    assert ds.current_timestep_index == 7
    x, y = ds[0]
    assert x[consts.SATELLITE_DATA].shape == (2, 7, 8, 8, 12)
    assert y[consts.SATELLITE_DATA].shape == (2, 12, 8, 8, 12)
    assert x[consts.NWP_DATA].shape == (2, 10, 7, 2, 2)
    # topo got a channel dim (datasets.py:104)
    assert x[consts.TOPOGRAPHIC_DATA].shape == (2, 8, 8, 1)
    for name in consts.DATETIME_FEATURE_NAMES:
        assert x[name].shape == (2, 7)
    assert y[consts.SATELLITE_DATETIME_INDEX].shape == (2, 12)


def test_sfb_native_store_and_streaming(tmp_path):
    """Native C++ ingest: store roundtrip + streaming split (skips unbuilt)."""
    from satflow_tpu.data.native_ingest import native_available, write_sfb

    if not native_available(auto_build=True):
        pytest.skip("native ingest library not built (no g++)")

    from satflow_tpu.data.datasets import (
        NativeStreamingDataset,
        SatFlowDataset,
        SfbBatchStore,
    )

    path = str(tmp_path / "train")
    store = SfbBatchStore(path)
    rng = np.random.default_rng(0)
    ref = []
    for i in range(3):
        batch = {
            consts.SATELLITE_DATA: rng.random((2, 10, 8, 8, 3)).astype(np.float32),
            consts.NWP_DATA: rng.standard_normal((2, 10, 10, 2, 2)).astype(np.float32),
            consts.TOPOGRAPHIC_DATA: rng.random((2, 8, 8)).astype(np.float32),
        }
        store.write(i, batch)
        ref.append(batch)

    # random-access store path (via SatFlowDataset)
    ds = SatFlowDataset(3, path, history_minutes=30, forecast_minutes=20)
    x, y = ds[1]
    np.testing.assert_array_equal(
        x[consts.SATELLITE_DATA], ref[1][consts.SATELLITE_DATA][:, :7]
    )
    assert x[consts.TOPOGRAPHIC_DATA].shape == (2, 8, 8, 1)

    # streaming path (persistent native reader threads, in order)
    stream = NativeStreamingDataset(path, history_minutes=30, num_threads=2)
    for i, (x, y) in enumerate(stream):
        np.testing.assert_array_equal(
            y[consts.SATELLITE_DATA], ref[i][consts.SATELLITE_DATA][:, 7:]
        )
    assert i == 2

    # zero-copy path: arrays view the native ring; valid until next step
    from satflow_tpu.data.native_ingest import NativeSfbLoader

    paths = [f"{path}/batch_{j}.sfb" for j in range(3)]
    for j, batch in enumerate(NativeSfbLoader(paths, 2, zero_copy=True)):
        arr = batch[consts.SATELLITE_DATA]
        assert not arr.flags.writeable
        np.testing.assert_array_equal(arr, ref[j][consts.SATELLITE_DATA])


def test_prefetcher_orders_and_completes():
    from satflow_tpu.data.datamodule import Prefetcher

    ds = FakeDataset(batch_size=1, length=5, width=4, height=4)
    items = list(Prefetcher(ds, num_workers=3, prefetch=2))
    assert len(items) == 5
    ref = [ds[i] for i in range(5)]
    for got, want in zip(items, ref):
        np.testing.assert_array_equal(
            got[0][consts.SATELLITE_DATA], want[0][consts.SATELLITE_DATA]
        )


def test_prefetcher_propagates_worker_errors():
    """An exception inside a reader thread must surface, not hang the loop."""
    from satflow_tpu.data.datamodule import Prefetcher

    class Boom:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            if i == 1:
                raise ValueError("bad batch")
            return i

    it = iter(Prefetcher(Boom(), num_workers=2, prefetch=2))
    assert next(it) == 0
    with pytest.raises(ValueError, match="bad batch"):
        next(it)


def test_convert_store_to_sfb(tmp_path):
    """The conversion CLI migrates an npz store to .sfb; the native reader
    returns identical arrays (skipped where the C++ loader can't build)."""
    import numpy as np
    import pytest as _pytest

    from satflow_tpu.data.datasets import SfbBatchStore, write_fake_store
    from satflow_tpu.data.native_ingest import native_available

    if not native_available(auto_build=True):
        _pytest.skip("native ingest library unavailable")

    from satflow_tpu.data.convert import convert
    from satflow_tpu.data.datasets import NpzBatchStore

    src = str(tmp_path / "npz")
    dst = str(tmp_path / "sfb")
    write_fake_store(src, n_batches=3, batch_size=2, size=8)
    n = convert(src, dst, verbose=False)
    assert n == 3
    a = NpzBatchStore(src).read(1)
    b = SfbBatchStore(dst).read(1)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_netcdf_store_roundtrip_and_train_step(tmp_path):
    """The reference's actual wire format (``batch_{i}.nc``, reference
    satflow/data/datasets.py:4-16) round-trips through NetCDFBatchStore
    (scipy NetCDF3 dialect) -> SatFlowDataset split -> a ConvLSTM train step,
    with no xarray/netCDF4 installed."""
    import jax

    from satflow_tpu.data.datasets import (
        NetCDFBatchStore,
        NpzBatchStore,
        open_batch_store,
        write_fake_store,
    )

    src = str(tmp_path / "npz")
    write_fake_store(src, n_batches=2, batch_size=2, size=8, seq_length=19)
    nc_dir = str(tmp_path / "nc" / "train")
    nc = NetCDFBatchStore(nc_dir)
    for i in range(2):
        nc.write(i, NpzBatchStore(src).read(i))
    assert len(nc) == 2

    # open_batch_store sniffs the dir and picks the NetCDF store
    store = open_batch_store(nc_dir)
    assert isinstance(store, NetCDFBatchStore)
    a = NpzBatchStore(src).read(1)
    b = store.read(1)
    assert set(b) == set(a)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])

    ds = SatFlowDataset(2, nc_dir, history_minutes=30, forecast_minutes=60)
    x, y = ds[0]
    assert x[consts.SATELLITE_DATA].shape == (2, 7, 8, 8, 12)
    assert y[consts.SATELLITE_DATA].shape == (2, 12, 8, 8, 12)

    from satflow_tpu.models.conv_lstm import EncoderDecoderConvLSTM
    from satflow_tpu.train.steps import make_train_step
    from satflow_tpu.train.state import TrainState

    model = EncoderDecoderConvLSTM(
        input_channels=12, out_channels=12, hidden_dim=4, forecast_steps=12
    )
    variables = model.init_variables(jax.random.PRNGKey(0), (x, y))
    params, mstate = model.split_variables(variables)
    state = TrainState.create(params, mstate, model.make_optimizer())
    step = make_train_step(model)
    state, metrics = step(state, (x, y), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_netcdf_store_reads_hdf5_netcdf4_layout(tmp_path):
    """NetCDF4 files are HDF5 containers; the store decodes them via h5py and
    drops dimension-scale coordinate variables (xarray data_vars semantics)."""
    import h5py

    from satflow_tpu.data.datasets import NetCDFBatchStore

    d = str(tmp_path / "nc4")
    import os

    os.makedirs(d)
    sat = np.arange(24, dtype=np.float32).reshape(1, 2, 3, 4)
    with h5py.File(os.path.join(d, "batch_0.nc"), "w") as f:
        v = f.create_dataset("sat_data", data=sat)
        c = f.create_dataset("time", data=np.arange(2, dtype=np.float64))
        c.attrs["CLASS"] = np.bytes_("DIMENSION_SCALE")
        c.attrs["NAME"] = np.bytes_("time")
    store = NetCDFBatchStore(d)
    out = store.read(0)
    assert set(out) == {"sat_data"}
    np.testing.assert_array_equal(out["sat_data"], sat)


def test_store_len_ignores_stray_files(tmp_path):
    """stats.npz / norm files beside the batches must not inflate len()
    (read(len-1) would hit a missing batch file mid-epoch)."""
    import os

    from satflow_tpu.data.datasets import NpzBatchStore

    path = str(tmp_path / "store")
    write_fake_store(path, n_batches=3, batch_size=2, size=8)
    np.savez(os.path.join(path, "stats.npz"), mean=np.zeros(1))
    np.savez(os.path.join(path, "batch_extra_notes.npz"), x=np.zeros(1))
    store = NpzBatchStore(path)
    assert len(store) == 3
    store.read(len(store) - 1)  # the full reported range is readable


def test_missing_configuration_file_raises(tmp_path):
    """A typo'd configuration_filename must fail loudly, not silently fall
    back to default history/forecast minutes (wrong past/future split)."""
    import pytest

    from satflow_tpu.data.datamodule import SatFlowDataModule

    with pytest.raises(FileNotFoundError, match="configuration_filename"):
        SatFlowDataModule(
            fake_data=True, num_workers=0, shard=False,
            configuration_filename=str(tmp_path / "nope.yaml"),
        )


def test_sfb_corrupt_files_error_cleanly(tmp_path):
    """Truncated/forged .sfb files (e.g. a failed remote fetch) must surface
    a clean ingest error — never crash or read out of bounds (the parser
    length-checks against remaining bytes, not pointer arithmetic)."""
    import struct

    from satflow_tpu.data.native_ingest import (
        NativeSfbLoader,
        native_available,
        write_sfb,
    )

    if not native_available(auto_build=True):
        pytest.skip("native ingest library not built (no g++)")

    good = str(tmp_path / "batch_0.sfb")
    write_sfb(good, {"sat_data": np.zeros((2, 4, 4, 1), np.float32)})
    raw = open(good, "rb").read()

    truncated = str(tmp_path / "batch_1.sfb")
    open(truncated, "wb").write(raw[: len(raw) // 2])

    # forge a huge byte_len in the first entry header: magic(8) + n(4) +
    # name_len(2) + name + dtype(1) + ndim(1) + dims(4*ndim) -> byte_len u64
    name_len = struct.unpack_from("<H", raw, 12)[0]
    ndim_off = 12 + 2 + name_len + 1
    ndim = raw[ndim_off]
    blen_off = ndim_off + 1 + 4 * ndim
    forged = bytearray(raw)
    struct.pack_into("<Q", forged, blen_off, 2**63)
    overflow = str(tmp_path / "batch_2.sfb")
    open(overflow, "wb").write(bytes(forged))

    for bad in (truncated, overflow):
        with pytest.raises(OSError, match="native ingest error"):
            list(NativeSfbLoader([bad], num_threads=1))
