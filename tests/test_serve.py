"""Serving path: compiled sessions, micro-batching, and the HTTP surface."""

import io
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from satflow_tpu.core.registry import create_model
import satflow_tpu.models  # noqa: F401
from satflow_tpu.serve import InferenceSession, MicroBatcher, NowcastServer

B, T, H, W, C, STEPS = 2, 3, 16, 16, 4, 2


def _session(max_batch=4):
    model = create_model(
        "encoderdecoderconvlstm", input_channels=C, out_channels=C,
        forecast_steps=STEPS, hidden_dim=8,
    )
    x = np.zeros((1, T, H, W, C), np.float32)
    variables = model.module.init(jax.random.PRNGKey(0), x)
    return InferenceSession(model, max_batch=max_batch, variables=variables)


def test_session_pads_and_chunks():
    s = _session(max_batch=4)
    x = np.random.default_rng(0).random((B, T, H, W, C)).astype(np.float32)
    y = s.predict(x)
    assert y.shape == (B, STEPS, H, W, C)
    # deterministic: padded-batch result equals itself sample-wise
    y1 = s.predict(x[:1])
    np.testing.assert_allclose(y[:1], y1, atol=1e-6)
    # single-sample convenience and >max_batch chunking
    y_single = s.predict(x[0])
    assert y_single.shape == (STEPS, H, W, C)
    big = np.concatenate([x] * 3, axis=0)  # 6 > max_batch=4
    y_big = s.predict(big)
    assert y_big.shape == (6, STEPS, H, W, C)
    np.testing.assert_allclose(y_big[:B], y, atol=1e-6)


def test_session_requires_variables():
    model = create_model(
        "encoderdecoderconvlstm", input_channels=C, out_channels=C,
        forecast_steps=STEPS, hidden_dim=8,
    )
    with pytest.raises(ValueError, match="restored_variables"):
        InferenceSession(model)


def test_microbatcher_coalesces_concurrent_requests():
    s = _session(max_batch=8)
    mb = MicroBatcher(s, window_ms=100.0)
    try:
        x = np.random.default_rng(1).random((T, H, W, C)).astype(np.float32)
        results = [None] * 6
        errs = []

        def call(i):
            try:
                results[i] = mb.submit(x, timeout=60.0)
            except BaseException as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        for r in results:
            assert r.shape == (STEPS, H, W, C)
            np.testing.assert_allclose(r, results[0], atol=1e-6)
        # 6 concurrent singles must NOT have run as 6 forwards
        assert mb.batches_run <= 3
    finally:
        mb.close()


def test_http_server_predict_info_health():
    s = _session(max_batch=4)
    srv = NowcastServer(s, host="127.0.0.1", port=0, window_ms=1.0)
    srv.start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        assert urllib.request.urlopen(f"{base}/healthz").read() == b"ok"
        info = json.loads(urllib.request.urlopen(f"{base}/info").read())
        assert info["forecast_steps"] == STEPS and info["max_batch"] == 4

        x = np.random.default_rng(2).random((B, T, H, W, C)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(
            f"{base}/predict", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"},
        )
        y = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
        assert y.shape == (B, STEPS, H, W, C)
        np.testing.assert_allclose(y, s.predict(x), atol=1e-6)

        # malformed request -> 400 with a JSON error, server stays up
        bad = urllib.request.Request(f"{base}/predict", data=b"not-an-npy")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 400
        assert urllib.request.urlopen(f"{base}/healthz").read() == b"ok"
    finally:
        srv.close()


def test_server_serves_checkpointed_model(tmp_path):
    """End to end: train -> checkpoint -> serve('local:...') -> HTTP predict."""
    import optax

    from satflow_tpu.data.fake import FakeDataset
    from satflow_tpu.train.checkpoint import save_checkpoint
    from satflow_tpu.train.state import TrainState

    model = create_model(
        "encoderdecoderconvlstm", input_channels=12, out_channels=2,
        forecast_steps=STEPS, hidden_dim=4,
    )
    ds = FakeDataset(history_minutes=15, forecast_minutes=10, length=1,
                     batch_size=2, width=H, height=W)
    batch = ds[0]
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    params, model_state = model.split_variables(variables)
    state = TrainState.create(params, model_state, optax.adam(1e-3))
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, state, model)

    srv = NowcastServer(f"local:{ckpt}", host="127.0.0.1", port=0, max_batch=2)
    srv.start()
    try:
        x, _ = batch
        buf = io.BytesIO()
        np.save(buf, np.asarray(x["sat_data"], np.float32))
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/predict", data=buf.getvalue())
        y = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
        assert y.shape[:2] == (2, STEPS) and np.isfinite(y).all()
    finally:
        srv.close()


def test_session_out_dtype_wire_format():
    """out_dtype casts predictions on-device before the host fetch (the
    transfer, not the compute, dominates a serving request)."""
    import jax.numpy as jnp

    s = _session(max_batch=2)
    s16 = InferenceSession(s.model, max_batch=2,
                           variables=s._variables, out_dtype=jnp.float16)
    x = np.random.default_rng(3).random((1, T, H, W, C)).astype(np.float32)
    y32, y16 = s.predict(x), s16.predict(x)
    assert y16.dtype == np.float16 and y32.dtype == np.float32
    np.testing.assert_allclose(y16.astype(np.float32), y32, atol=2e-3)


def test_server_closes_connection_on_unread_body():
    """404/oversize paths leave the body unread — the server must close the
    connection so keep-alive peers can't parse body bytes as a request."""
    import http.client

    s = _session(max_batch=2)
    srv = NowcastServer(s, host="127.0.0.1", port=0)
    srv.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port)
        body = b"x" * 1024
        conn.request("POST", "/nope", body=body)
        r = conn.getresponse()
        assert r.status == 404
        r.read()
        # server must have signalled close (else the next parse reads `body`)
        assert r.headers.get("Connection", "").lower() == "close" or r.will_close
        conn.close()
    finally:
        srv.close()


def test_server_fault_status_codes():
    """Client faults are 4xx; batcher timeouts surface as 503."""
    import http.client
    import io as _io

    s = _session(max_batch=2)
    srv = NowcastServer(s, host="127.0.0.1", port=0)
    srv.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port)
        # wrong ndim -> 400
        buf = _io.BytesIO()
        np.save(buf, np.zeros((3, 3), np.float32))
        conn.request("POST", "/predict", body=buf.getvalue())
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        conn.close()

        # a dead batcher -> RuntimeError -> 500 (server fault, not client)
        srv.batcher.close()
        conn = http.client.HTTPConnection("127.0.0.1", srv.port)
        buf = _io.BytesIO()
        np.save(buf, np.zeros((1, T, H, W, C), np.float32))
        conn.request("POST", "/predict", body=buf.getvalue())
        r = conn.getresponse()
        assert r.status == 500
        conn.close()
    finally:
        srv.close()


def test_session_serves_gan_samples():
    """GAN families serve generator samples. CloudGAN's generator is
    deterministic (conditional UNet, no latent) — same input, same frames;
    DGMR draws latents — the per-call seed counter yields fresh samples."""
    from satflow_tpu.data.fake import AdvectionDataset

    model = create_model(
        "cloudgan", forecast_steps=2, input_channels=2,
        channels_per_timestep=2, num_filters=4, features_start=4,
        unet_depth=2,
    )
    ds = AdvectionDataset(batch_size=2, width=16, height=16,
                          number_sat_channels=2, history_minutes=15,
                          forecast_minutes=10, length=1)
    batch = ds[0]
    g_vars, _ = model.init_gan_variables(jax.random.PRNGKey(0), batch)
    s = InferenceSession(model, max_batch=2, variables=g_vars)
    x, _ = model.prepare_batch(batch)
    y1 = s.predict(np.asarray(x))
    y2 = s.predict(np.asarray(x))
    assert y1.shape[0] == 2 and np.isfinite(y1).all() and np.isfinite(y2).all()
    np.testing.assert_allclose(y1, y2, atol=1e-6)  # no latent: deterministic


def test_session_dgmr_fresh_samples_per_request():
    """DGMR sampling: repeated requests draw DIFFERENT latents (per-call
    seed counter) through one fixed compiled program."""
    from satflow_tpu.data.fake import AdvectionDataset

    model = create_model(
        "nowcastinggan", forecast_steps=2, input_channels=1, output_shape=32,
        context_channels=16, latent_channels=32, disc_channels=4,
        disc_spatial_layers=2, disc_temporal_layers=1, num_samples=1,
    )
    ds = AdvectionDataset(batch_size=1, width=32, height=32,
                          number_sat_channels=1, history_minutes=15,
                          forecast_minutes=10, length=1)
    batch = ds[0]
    g_vars, _ = model.init_gan_variables(jax.random.PRNGKey(0), batch)
    s = InferenceSession(model, max_batch=1, variables=g_vars)
    x, _ = model.prepare_batch(batch)
    y1 = s.predict(np.asarray(x))
    y2 = s.predict(np.asarray(x))
    assert np.isfinite(y1).all() and np.isfinite(y2).all()
    assert not np.allclose(y1, y2)  # fresh latent draw per request


def test_session_gan_checkpoint_layout(tmp_path):
    """A checkpoint-loaded GAN (params={'generator','discriminator'}) serves
    through the generator subtree — the local:<ckpt> serving path."""
    import optax

    from satflow_tpu.data.fake import AdvectionDataset
    from satflow_tpu.train.checkpoint import save_checkpoint
    from satflow_tpu.train.state import GANTrainState

    model = create_model(
        "cloudgan", forecast_steps=2, input_channels=2,
        channels_per_timestep=2, num_filters=4, features_start=4,
        unet_depth=2,
    )
    ds = AdvectionDataset(batch_size=2, width=16, height=16,
                          number_sat_channels=2, history_minutes=15,
                          forecast_minutes=10, length=1)
    batch = ds[0]
    g_vars, d_vars = model.init_gan_variables(jax.random.PRNGKey(0), batch)
    g_params, g_state = model.split_variables(g_vars)
    d_params, d_state = model.split_variables(d_vars)
    state = GANTrainState.create(
        g_params, d_params, {"g": g_state, "d": d_state},
        optax.adam(1e-4), optax.adam(1e-4),
    )
    ckpt = str(tmp_path / "gan_ck")
    save_checkpoint(ckpt, state, model)

    s = InferenceSession(f"local:{ckpt}", max_batch=2)
    x, _ = model.prepare_batch(batch)
    y = s.predict(np.asarray(x))
    assert y.shape[0] == 2 and np.isfinite(y).all()


def test_session_dp_sharded_serving():
    """mesh= shards each padded request over the data axis (one session
    drives all chips); results equal the single-device session."""
    from satflow_tpu.parallel.mesh import get_mesh

    mesh = get_mesh()  # (data=8, model=1) on the virtual CPU mesh
    s1 = _session(max_batch=8)
    s8 = InferenceSession(s1.model, max_batch=8, variables=s1._variables,
                          mesh=mesh)
    x = np.random.default_rng(7).random((3, T, H, W, C)).astype(np.float32)
    np.testing.assert_allclose(s8.predict(x), s1.predict(x), atol=1e-5)

    with pytest.raises(ValueError, match="data axis"):
        InferenceSession(s1.model, max_batch=3, variables=s1._variables,
                         mesh=mesh)


def test_stablehlo_export_roundtrip(tmp_path):
    """serve/export.py: the compiled forward serializes to ONE StableHLO
    artifact (weights baked in) and deserializes WITHOUT the model zoo,
    producing the same predictions; shape/magic misuse gives clear errors."""
    from satflow_tpu.serve.export import export_model, load_exported

    s = _session(max_batch=2)
    path = str(tmp_path / "model.shlo")
    meta = export_model(s.model, s._variables, path, batch=B, history=T,
                        size=H, channels=C)
    assert meta["in_shape"] == [B, T, H, W, C]
    assert meta["out_shape"][:2] == [B, STEPS]

    art = load_exported(path)
    x = np.random.default_rng(3).random((B, T, H, W, C)).astype(np.float32)
    y_ref = np.asarray(s.model.forward(s._variables, x))
    np.testing.assert_allclose(art(x), y_ref, atol=1e-5)

    with pytest.raises(ValueError, match="fixed at export time"):
        art(x[:1])
    bad = tmp_path / "bad.shlo"
    bad.write_bytes(b"not an artifact")
    with pytest.raises(ValueError, match="magic"):
        load_exported(str(bad))


def test_stablehlo_export_cli_from_checkpoint(tmp_path):
    """End to end: train-state checkpoint -> `python -m
    satflow_tpu.serve.export local:<dir> out` -> load -> predict."""
    import optax

    from satflow_tpu.serve.export import load_exported, main as export_main
    from satflow_tpu.train.checkpoint import save_checkpoint
    from satflow_tpu.train.state import TrainState

    model = create_model(
        "encoderdecoderconvlstm", input_channels=C, out_channels=C,
        forecast_steps=STEPS, hidden_dim=4,
    )
    x = np.zeros((1, T, H, W, C), np.float32)
    variables = model.module.init(jax.random.PRNGKey(0), x)
    params, model_state = model.split_variables(variables)
    state = TrainState.create(params, model_state, optax.adam(1e-3))
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, state, model)

    out = str(tmp_path / "model.shlo")
    export_main([f"local:{ckpt}", out, "--batch", "1", "--history", str(T),
                 "--size", str(H), "--channels", str(C)])
    art = load_exported(out)
    xr = np.random.default_rng(5).random((1, T, H, W, C)).astype(np.float32)
    y = art(xr)
    assert y.shape == (1, STEPS, H, W, C) and np.isfinite(y).all()
