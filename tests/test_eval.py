"""Evaluation harness tests."""

import numpy as np

from satflow_tpu.core.registry import create_model
from satflow_tpu.data.fake import AdvectionDataset
from satflow_tpu.eval.evaluate import evaluate_model, save_results
import satflow_tpu.models  # noqa: F401


def test_evaluate_model_curves(tmp_path, rng):
    model = create_model(
        "encoderdecoderconvlstm", input_channels=2, out_channels=2,
        forecast_steps=3, hidden_dim=4,
    )
    ds = AdvectionDataset(batch_size=2, width=16, height=16,
                          number_sat_channels=2, history_minutes=15,
                          forecast_minutes=15, length=2)
    variables = model.init_variables(rng, ds[0])
    results = evaluate_model(model, variables, ds, max_batches=2)
    assert results["mse"].shape == (2, 3)  # (channels, lead times)
    assert results["ssim"].shape == (3,)
    assert results["ms_ssim"].shape == (3,)
    assert np.isfinite(results["mse_mean"])
    assert -1.0 <= results["ssim_mean"] <= 1.0

    save_results(results, str(tmp_path))
    assert (tmp_path / "mse.npy").exists()
    assert (tmp_path / "summary.json").exists()

def test_crps_analytic_two_atom():
    """Classic-estimator CRPS matches the closed form for a two-atom
    forecast P = 0.5*d(-1) + 0.5*d(+1) against y=+1: integral of
    (F(t) - 1{t>=y})^2 dt = 0.5. The collapsed-to-mean forecast {0,0}
    scores |0-1| = 1.0 — CRPS separates calibrated spread from collapse,
    which ensemble-mean MSE cannot."""
    import jax.numpy as jnp

    from satflow_tpu.eval.probabilistic import crps_ensemble

    y = jnp.ones((1, 1))  # (B, T)
    diverse = jnp.array([[[+1.0], [-1.0]]])  # (B, M=2, T)
    collapsed = jnp.zeros((1, 2, 1))
    np.testing.assert_allclose(crps_ensemble(diverse, y), [0.5], atol=1e-6)
    np.testing.assert_allclose(crps_ensemble(collapsed, y), [1.0], atol=1e-6)
    # fair estimator: unbiased for iid draws (coef 1/(2 M (M-1)))
    np.testing.assert_allclose(
        crps_ensemble(diverse, y, fair=True), [0.0], atol=1e-6)


def test_crps_perfect_and_deterministic():
    """A deterministic hit scores 0; M=1 reduces to MAE (comparable with
    deterministic baselines); curve shape is per lead time."""
    import jax.numpy as jnp

    from satflow_tpu.eval.probabilistic import (crps_deterministic,
                                                crps_ensemble)

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(2, 3, 4, 4, 1)))
    np.testing.assert_allclose(crps_ensemble(y[:, None], y), np.zeros(3),
                               atol=1e-6)
    y_hat = y + 0.5
    np.testing.assert_allclose(crps_deterministic(y_hat, y),
                               np.full(3, 0.5), atol=1e-5)


def test_crps_rewards_calibrated_sampler_on_stochastic_futures():
    """On StochasticAdvectionDataset (future velocity redrawn), the oracle
    3-mode sampler must CRPS-beat both its own collapsed mean and
    persistence — the property that makes CRPS the DGMR selection metric
    (a collapsed sampler and a calibrated one have similar mean-MSE, but
    only CRPS penalizes the collapse)."""
    import jax.numpy as jnp

    from satflow_tpu.data.fake import StochasticAdvectionDataset
    from satflow_tpu.eval.probabilistic import crps_ensemble

    kw = dict(batch_size=4, width=32, height=32, number_sat_channels=1,
              history_minutes=15, forecast_minutes=30, velocity=(1, 2),
              decay=0.93, n_blobs=4)
    ds = StochasticAdvectionDataset(length=2, seed=300, **kw)
    steps = 6

    def oracle_modes(x_last):
        modes = []
        for ddx in (-2, 0, 2):
            cur = np.asarray(x_last).copy()
            seq = []
            for _ in range(steps):
                cur = np.roll(np.roll(cur, 1, axis=1), 2 + ddx, axis=2)
                cur = cur * 0.93
                seq.append(cur)
            modes.append(np.stack(seq, axis=1))
        return np.stack(modes, axis=1)  # (B, 3, T, H, W, C)

    crps_oracle, crps_collapsed, crps_persist = [], [], []
    for bi, (x, y) in enumerate(ds):
        if bi >= 2:
            break
        x_last = np.asarray(x["sat_data"])[:, -1]
        ynp = jnp.asarray(np.asarray(y["sat_data"])[:, :steps])
        ens = oracle_modes(x_last)[:, :, :steps]
        mean_ens = np.broadcast_to(ens.mean(axis=1, keepdims=True), ens.shape)
        persist = np.broadcast_to(x_last[:, None, None],
                                  (x_last.shape[0], 1, steps) + x_last.shape[1:])
        crps_oracle.append(np.mean(crps_ensemble(jnp.asarray(ens), ynp)))
        crps_collapsed.append(
            np.mean(crps_ensemble(jnp.asarray(mean_ens.copy()), ynp)))
        crps_persist.append(
            np.mean(crps_ensemble(jnp.asarray(persist.copy()), ynp)))

    o, c, p = map(np.mean, (crps_oracle, crps_collapsed, crps_persist))
    assert o < c < p, f"oracle {o:.5f} < collapsed {c:.5f} < persistence {p:.5f}"


def test_ensemble_eval_cli_on_gan_checkpoint(tmp_path, rng, monkeypatch, capsys):
    """`python -m satflow_tpu.eval.evaluate --ensemble M` on a DGMR
    checkpoint: extracts the generator subtree from the dual-network
    checkpoint layout and reports CRPS/spread curves."""
    import json
    import sys

    import optax

    from satflow_tpu.data.fake import FakeDataset
    from satflow_tpu.eval.evaluate import main as eval_main
    from satflow_tpu.train.checkpoint import save_checkpoint
    from satflow_tpu.train.state import GANTrainState

    model = create_model(
        "nowcastinggan", forecast_steps=2, input_channels=1, output_shape=32,
        context_channels=16, latent_channels=32, disc_channels=4,
        disc_spatial_layers=2, disc_temporal_layers=1, num_samples=2,
    )
    ds = FakeDataset(batch_size=1, width=32, height=32,
                     number_sat_channels=1, history_minutes=15,
                     forecast_minutes=10, length=1)
    g_vars, d_vars = model.init_gan_variables(rng, ds[0])
    g_params, g_state = model.split_variables(g_vars)
    d_params, d_state = model.split_variables(d_vars)
    g_tx, d_tx = model.make_optimizers()
    state = GANTrainState.create(
        g_params, d_params, {"g": g_state, "d": d_state}, g_tx, d_tx)
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, state, model)

    out = str(tmp_path / "eval")
    monkeypatch.setattr(sys, "argv", [
        "evaluate", "--checkpoint", ckpt, "--dataset", "fake",
        "--batches", "1", "--size", "32", "--channels", "1",
        "--history-minutes", "15", "--output", out, "--ensemble", "2",
    ])
    eval_main()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(summary["crps_mean"]) and np.isfinite(summary["mse_mean"])
    assert "sample_std" in summary
    crps = np.load(f"{out}/crps.npy")
    assert crps.shape == (2,) and np.isfinite(crps).all()
