"""Accuracy gate: train ConvLSTM + MetNet on decaying advection, compare to
persistence + optical flow, and write the per-lead-time curves to
docs/ACCURACY.md (the rebuild's analog of the reference's baseline study,
reference satflow/baseline/README.md:13-25).

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/accuracy_gate.py
       (or on TPU: python tools/accuracy_gate.py)
"""

from __future__ import annotations

import json
import os

import numpy as np


DS_KW = dict(batch_size=8, width=32, height=32, number_sat_channels=2,
             history_minutes=15, forecast_minutes=60, velocity=(1, 2),
             decay=0.93, n_blobs=4)
STEPS = 12


def make_dm():
    from satflow_tpu.data.datamodule import SatFlowDataModule
    from satflow_tpu.data.fake import DecayingAdvectionDataset

    class DecayDM(SatFlowDataModule):
        def __init__(self, **kwargs):
            super().__init__(fake_data=True, num_workers=0, shard=False, **kwargs)

        def _dataset(self, split, n):
            seed = {"train": 0, "validation": 100, "test": 200}[split]
            return DecayingAdvectionDataset(length=12, seed=seed, **DS_KW)

    return DecayDM()


def main():
    from satflow_tpu.baseline.optical_flow import run_baseline
    from satflow_tpu.core.registry import create_model
    from satflow_tpu.core.utils import setup_compilation_cache
    from satflow_tpu.data.fake import DecayingAdvectionDataset
    from satflow_tpu.eval.evaluate import evaluate_model
    from satflow_tpu.train.engine import Trainer
    import satflow_tpu.models  # noqa: F401

    setup_compilation_cache()
    eval_ds = DecayingAdvectionDataset(length=3, seed=300, **DS_KW)

    results = {}
    base = run_baseline(eval_ds, forecast_steps=STEPS, flow_method="farneback",
                        max_batches=3)
    results["persistence"] = {
        "mse_t": np.mean(base["baseline_loss"], axis=0).tolist(),
        "mse": float(np.mean(base["baseline_loss"])),
    }
    results["optical_flow"] = {
        "mse_t": np.mean(base["flow_loss"], axis=0).tolist(),
        "mse": float(np.mean(base["flow_loss"])),
    }

    models = {
        "convlstm": lambda: create_model(
            "encoderdecoderconvlstm", input_channels=2, out_channels=2,
            forecast_steps=STEPS, hidden_dim=32, lr=3e-3,
        ),
        "metnet": lambda: create_model(
            "litmetnet", input_channels=2, sat_channels=2, output_channels=2,
            input_size=32, forecast_steps=STEPS, hidden_dim=64, lr=2e-3,
        ),
    }

    for name, factory in models.items():
        model = factory()
        epochs = 30 if name == "convlstm" else 40
        trainer = Trainer(max_epochs=epochs, log_every_n_steps=100, seed=0)
        trainer.fit(model, make_dm())
        variables = {"params": trainer.state.params, **trainer.state.model_state}
        curves = evaluate_model(model, variables, eval_ds, max_batches=3,
                                compute_ms_ssim=True)
        results[name] = {
            "mse_t": np.mean(curves["mse"], axis=0).tolist(),
            "mse": float(np.mean(curves["mse"])),
            "ms_ssim_t": np.asarray(curves["ms_ssim"]).tolist(),
            "ms_ssim": float(np.mean(curves["ms_ssim"])),
            "epochs": epochs,
        }
        print(name, "mse", results[name]["mse"])

    os.makedirs("docs", exist_ok=True)
    with open("docs/accuracy_results.json", "w") as f:
        json.dump(results, f, indent=2)
    _write_md(results)
    print(json.dumps({k: v.get("mse") for k, v in results.items()}))


def _write_md(r):
    steps = len(r["persistence"]["mse_t"])
    lines = [
        "# Accuracy gate: trained models vs persistence & optical flow",
        "",
        "The reference's headline quality study is flow-vs-persistence MSE on",
        "EUMETSAT cloud masks (reference satflow/baseline/README.md:13-25:",
        "flow 0.1541 vs persistence 0.1566). That data is not available here,",
        "so the rebuild closes the same loop on a synthetic dataset with",
        "known dynamics: `DecayingAdvectionDataset` (translation the flow",
        "baseline CAN extrapolate + intensity decay it CANNOT). A trained",
        "model must beat BOTH baselines. Reproduce:",
        "`python tools/accuracy_gate.py`; gate enforced by",
        "`tests/test_accuracy.py`.",
        "",
        "| Method | Mean MSE (12 lead times) | Mean MS-SSIM |",
        "|---|---|---|",
    ]
    for name in ("persistence", "optical_flow", "convlstm", "metnet"):
        if name not in r:
            continue
        ms = r[name].get("ms_ssim")
        lines.append(
            f"| {name} | {r[name]['mse']:.5f} | "
            f"{'-' if ms is None else f'{ms:.4f}'} |"
        )
    lines += ["", "Per-lead-time MSE:", "", "| t | " + " | ".join(
        n for n in ("persistence", "optical_flow", "convlstm", "metnet") if n in r
    ) + " |", "|" + "---|" * (1 + sum(1 for n in ("persistence", "optical_flow", "convlstm", "metnet") if n in r))]
    for t in range(steps):
        row = [str(t)]
        for n in ("persistence", "optical_flow", "convlstm", "metnet"):
            if n in r:
                row.append(f"{r[n]['mse_t'][t]:.5f}")
        lines.append("| " + " | ".join(row) + " |")
    lines.append("")
    with open("docs/ACCURACY.md", "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
