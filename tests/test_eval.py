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
