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


ALL_ARMS = ("baselines", "convlstm", "perceiver", "metnet", "metnet_stoch",
            "unet", "runet", "attentionunet", "attentionrunet", "fcn",
            "deeplabv3", "pixelcnn")
# metnet_baselines: recompute the @metnet_grid baseline rows only (no
# training) — used when the baseline protocol changes
EXTRA_ARMS = ("metnet_baselines",)


def _to_metnet_grid(frames):
    # (F, 64, 64) -> center-crop 16 -> avg-pool 4x -> (F, 4, 4); numpy
    # mirror of crop_center + _avg_pool_frames in the MetNet model
    f, h, w = frames.shape
    sh, sw = (h - 16) // 2, (w - 16) // 2
    crop = frames[:, sh:sh + 16, sw:sw + 16]
    return crop.reshape(f, 4, 4, 4, 4).mean(axis=(2, 4))


def main(arms=None):
    from satflow_tpu.baseline.optical_flow import run_baseline
    from satflow_tpu.core.registry import create_model
    from satflow_tpu.core.utils import setup_compilation_cache
    from satflow_tpu.data.fake import DecayingAdvectionDataset
    from satflow_tpu.eval.evaluate import evaluate_model
    from satflow_tpu.train.engine import Trainer
    import satflow_tpu.models  # noqa: F401

    arms = set(arms or ALL_ARMS)
    unknown = arms - set(ALL_ARMS) - set(EXTRA_ARMS)
    if unknown:
        # a typo'd arm must not silently skip hours of intended training
        raise SystemExit(
            f"unknown --arms {sorted(unknown)}; valid: {list(ALL_ARMS)}"
        )
    setup_compilation_cache()
    eval_ds = DecayingAdvectionDataset(length=3, seed=300, **DS_KW)

    # incremental reruns (--arms unet,runet) merge into the existing study
    results = {}
    if os.path.exists("docs/accuracy_results.json"):
        with open("docs/accuracy_results.json") as f:
            results = json.load(f)
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
    # Farneback's 15px window degenerates toward zero flow on small decayed
    # blobs; also report the in-repo Horn-Schunck solve (the stronger flow).
    base_hs = run_baseline(eval_ds, forecast_steps=STEPS,
                           flow_method="horn_schunck", max_batches=3)
    results["optical_flow_hs"] = {
        "mse_t": np.mean(base_hs["flow_loss"], axis=0).tolist(),
        "mse": float(np.mean(base_hs["flow_loss"])),
    }

    def _eval_into(name, model, trainer, epochs, eval_set=None):
        variables = {"params": trainer.state.params,
                     **trainer.state.model_state}
        curves = evaluate_model(model, variables, eval_set or eval_ds,
                                max_batches=3, compute_ms_ssim=True)
        results[name] = {
            "mse_t": np.mean(curves["mse"], axis=0).tolist(),
            "mse": float(np.mean(curves["mse"])),
            "ms_ssim_t": np.asarray(curves["ms_ssim"]).tolist(),
            "ms_ssim": float(np.mean(curves["ms_ssim"])),
            "epochs": epochs,
        }
        print(name, "mse", results[name]["mse"])

    # --- ConvLSTM arm: full-resolution, directly against the baselines ------
    if "convlstm" in arms:
        model = create_model(
            "encoderdecoderconvlstm", input_channels=2, out_channels=2,
            forecast_steps=STEPS, hidden_dim=32, lr=3e-3,
        )
        trainer = Trainer(max_epochs=30, log_every_n_steps=100, seed=0)
        trainer.fit(model, make_dm())
        _eval_into("convlstm", model, trainer, 30)

    # --- Perceiver arm: same full-resolution geometry as ConvLSTM -----------
    if "perceiver" in arms:
        epochs_p = 60
        perceiver = create_model(
            "perceiver", input_channels=2, sat_channels=2, base_channels=1,
            input_size=32, forecast_steps=STEPS, history_steps=4,
            depth=3, num_latents=64, latent_dim=128, dim=48, queries_dim=48,
            num_freq_bands=16, predict_timesteps_together=True,
            lr=2e-3, warmup_steps=100, total_steps=epochs_p * 12,
        )
        trainer = Trainer(max_epochs=epochs_p, log_every_n_steps=500, seed=0)
        trainer.fit(perceiver, make_dm())
        _eval_into("perceiver", perceiver, trainer, epochs_p)

    # --- Unet / RUnet arms: the stacked image-to-image family (all lead
    # times as output channels, reference unet.py:24-31 convention) ---------
    # recipe basis: the 16px probe — features_start=32 @ lr 3e-3 is what
    # makes the single-shot family beat the flow baseline (16 features
    # plateaus above it); runet needs ~1.5x the unet schedule.
    if "unet" in arms:
        epochs_u = 60
        unet = create_model(
            "unet", input_channels=8, forecast_steps=STEPS,
            channels_per_timestep=2, features_start=32, depth=3, lr=3e-3,
        )
        trainer = Trainer(max_epochs=epochs_u, log_every_n_steps=500, seed=0)
        trainer.fit(unet, make_dm())
        _eval_into("unet", unet, trainer, epochs_u)

    if "runet" in arms:
        epochs_r = 100
        runet = create_model(
            "runet", input_channels=8, forecast_steps=STEPS,
            channels_per_timestep=2, features_start=32, depth=3, lr=3e-3,
        )
        trainer = Trainer(max_epochs=epochs_r, log_every_n_steps=500, seed=0)
        trainer.fit(runet, make_dm())
        _eval_into("runet", runet, trainer, epochs_r)

    # remaining stacked-family arms (reference attention_unet.py:13-337,
    # fcn.py:12-115, deeplabv3.py:12-120); the recurrent attention variant
    # (R2AttU) is the hardest to optimize — the 16px probe shows it needs
    # 2x the width (64) and the longest schedule to pass the flow baseline
    # (at width 32 it plateaus at ~1.5x the flow MSE). DeeplabV3's ASPP at
    # output-stride 16 sees a 2x2 feature map at this geometry (the dilated
    # branches degenerate to their center tap) — see the study note.
    stacked = {
        "attentionunet": (60, 3e-3, dict(features_start=32, depth=3)),
        "attentionrunet": (200, 3e-3, dict(features_start=64, depth=3)),
        "fcn": (60, 3e-3, {}),
        "deeplabv3": (150, 1e-3, {}),
        # causal masked convs (reference pixel_cnn.py:8-64) — the up-left
        # receptive field covers the advection source, so it converges fast
        "pixelcnn": (40, 1e-3, {}),
    }
    for name, (n_epochs, lr, extra) in stacked.items():
        if name not in arms:
            continue
        m = create_model(
            name, input_channels=8, forecast_steps=STEPS,
            channels_per_timestep=2, lr=lr, **extra,
        )
        trainer = Trainer(max_epochs=n_epochs, log_every_n_steps=2000, seed=0)
        trainer.fit(m, make_dm())
        _eval_into(name, m, trainer, n_epochs)

    # --- MetNet arm: MetNet predicts the center 1/4 crop at 1/16 resolution
    # (reference pl_metnet geometry) — apples-to-apples means SCORING the
    # baselines at that SAME target geometry (64px data -> 4x4 targets). The
    # flow itself is solved and warped at INPUT resolution and only then
    # pooled to the target grid (the reference's compute-on-full-res-HRV
    # protocol, baseline/README.md:18-22): solving flow on the pooled 4x4
    # grid degenerates to zero flow ≡ persistence (the r3 verdict's
    # "two-way gate" defect).
    if arms & {"metnet", "metnet_baselines"}:
        from satflow_tpu.data.fake import DecayingAdvectionDataset

        ds64 = dict(DS_KW, width=64, height=64)
        eval64 = DecayingAdvectionDataset(length=3, seed=300, **ds64)

        base_m = run_baseline(eval64, forecast_steps=STEPS,
                              flow_method="farneback", max_batches=3,
                              target_view=_to_metnet_grid)
        results["persistence@metnet_grid"] = {
            "mse_t": np.mean(base_m["baseline_loss"], axis=0).tolist(),
            "mse": float(np.mean(base_m["baseline_loss"])),
        }
        results["optical_flow@metnet_grid"] = {
            "mse_t": np.mean(base_m["flow_loss"], axis=0).tolist(),
            "mse": float(np.mean(base_m["flow_loss"])),
        }

    if "metnet" in arms:
        from satflow_tpu.data.fake import DecayingAdvectionDataset

        ds64 = dict(DS_KW, width=64, height=64)
        eval64 = DecayingAdvectionDataset(length=3, seed=300, **ds64)
        dm64 = make_dm()
        dm64._dataset = lambda split, n: DecayingAdvectionDataset(
            length=12, seed={"train": 0, "validation": 100,
                             "test": 200}[split],
            **ds64,
        )
        # warmup must fit the short run: the default warmup_steps=1000 would
        # keep the LR in warmup for the whole study (12 batches/epoch).
        epochs_m = 150
        metnet = create_model(
            "litmetnet", input_channels=2, sat_channels=2, output_channels=2,
            input_size=64, forecast_steps=STEPS, hidden_dim=64, lr=2e-3,
            warmup_steps=100, total_steps=epochs_m * 12,
        )
        trainer = Trainer(max_epochs=epochs_m, log_every_n_steps=500, seed=0)
        trainer.fit(metnet, dm64)
        _eval_into("metnet", metnet, trainer, epochs_m, eval_set=eval64)
        print("metnet vs persistence@grid",
              results["persistence@metnet_grid"]["mse"])

    # --- MetNet stochastic arm: the REAL three-way gate. On deterministic
    # advection the full-res-solved flow arm is a near-oracle at the pooled
    # grid (it recovers the exact generating motion; pooling suppresses its
    # sparse decay residual quadratically in blob coverage) — 27x better
    # than persistence, a regime nothing like the reference's real-data
    # finding of flow only 1.6% ahead (reference baseline/README.md:13-25,
    # 0.1541 vs 0.1566: real clouds evolve unpredictably, so extrapolating
    # past motion is beatable). StochasticAdvectionDataset reproduces that
    # regime (future velocity redrawn at the boundary): measured flow
    # 0.00144 vs persistence 0.00200 (+28%), and a trained MetNet that
    # hedges over the velocity modes must beat BOTH.
    if "metnet_stoch" in arms:
        from satflow_tpu.data.fake import StochasticAdvectionDataset

        ds64 = dict(DS_KW, width=64, height=64)
        eval64s = StochasticAdvectionDataset(length=3, seed=300, **ds64)
        base_s = run_baseline(eval64s, forecast_steps=STEPS,
                              flow_method="farneback", max_batches=3,
                              target_view=_to_metnet_grid)
        results["persistence@metnet_grid_stoch"] = {
            "mse_t": np.mean(base_s["baseline_loss"], axis=0).tolist(),
            "mse": float(np.mean(base_s["baseline_loss"])),
        }
        results["optical_flow@metnet_grid_stoch"] = {
            "mse_t": np.mean(base_s["flow_loss"], axis=0).tolist(),
            "mse": float(np.mean(base_s["flow_loss"])),
        }
        dm64s = make_dm()
        dm64s._dataset = lambda split, n: StochasticAdvectionDataset(
            length=12, seed={"train": 0, "validation": 100,
                             "test": 200}[split],
            **ds64,
        )
        epochs_ms = 150
        metnet_s = create_model(
            "litmetnet", input_channels=2, sat_channels=2, output_channels=2,
            input_size=64, forecast_steps=STEPS, hidden_dim=64, lr=2e-3,
            warmup_steps=100, total_steps=epochs_ms * 12,
        )
        trainer = Trainer(max_epochs=epochs_ms, log_every_n_steps=500, seed=0)
        trainer.fit(metnet_s, dm64s)
        _eval_into("metnet@stoch", metnet_s, trainer, epochs_ms,
                   eval_set=eval64s)
        print("metnet@stoch vs flow@grid_stoch",
              results["optical_flow@metnet_grid_stoch"]["mse"])

    os.makedirs("docs", exist_ok=True)
    with open("docs/accuracy_results.json", "w") as f:
        json.dump(results, f, indent=2)
    _write_md(results)
    print(json.dumps({k: v.get("mse") for k, v in results.items()}))


_FULL_RES = ("persistence", "optical_flow", "optical_flow_hs", "convlstm",
             "perceiver", "unet", "runet", "attentionunet", "attentionrunet",
             "fcn", "deeplabv3", "pixelcnn")
_METNET_GRID = ("persistence@metnet_grid", "optical_flow@metnet_grid", "metnet")
_METNET_STOCH = ("persistence@metnet_grid_stoch",
                 "optical_flow@metnet_grid_stoch", "metnet@stoch")


def _table(r, names, steps):
    lines = ["| Method | Mean MSE | Mean MS-SSIM |", "|---|---|---|"]
    for name in names:
        if name not in r:
            continue
        ms = r[name].get("ms_ssim")
        lines.append(
            f"| {name} | {r[name]['mse']:.5f} | "
            f"{'-' if ms is None else f'{ms:.4f}'} |"
        )
    present = [n for n in names if n in r]
    lines += ["", "| t | " + " | ".join(present) + " |",
              "|" + "---|" * (1 + len(present))]
    for t in range(steps):
        row = [str(t)] + [f"{r[n]['mse_t'][t]:.5f}" for n in present]
        lines.append("| " + " | ".join(row) + " |")
    return lines


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
        "## ConvLSTM, Perceiver & the stacked families — full resolution"
        " (32px, 12 lead times)",
        "",
        "Unet/RUnet/attention variants/FCN/DeeplabV3 are the reference's",
        "stacked image-to-image families (all lead times as output",
        "channels, reference unet.py:24-31) — single-shot prediction,",
        "no autoregression.",
        "",
        *_table(r, _FULL_RES, steps),
        "",
        "## MetNet — at its output geometry",
        "",
        "MetNet predicts the center 1/4 crop at 1/16 resolution (the",
        "reference pl_metnet geometry), so its baselines are SCORED on the",
        "SAME pooled target grid (64px data -> 4x4 targets). The flow arm",
        "is solved and warped at input resolution and only then pooled",
        "(the reference's compute-on-full-res protocol) — solving on the",
        "pooled grid degenerates to zero flow ≡ persistence.",
        "",
        "On DETERMINISTIC advection this full-res flow arm is a",
        "near-oracle at the pooled grid: it recovers the exact generating",
        "motion, and pooling suppresses its one blind spot (the sparse",
        "decay residual) quadratically in blob coverage — flow lands 27x",
        "below persistence, a regime nothing like the reference's real",
        "data, where flow beats persistence by 1.6% (0.1541 vs 0.1566,",
        "baseline/README.md:13-25) because real clouds evolve",
        "unpredictably. MetNet beats persistence here but not that oracle:",
        "",
        *_table(r, _METNET_GRID, steps),
        "",
        "The REAL three-way gate therefore runs on",
        "`StochasticAdvectionDataset` (future velocity redrawn at the",
        "history boundary), which reproduces the reference's real-data",
        "regime — extrapolating past motion helps but is beatable, and a",
        "trained MetNet that hedges over the velocity modes must beat",
        "BOTH baselines (gated in tests/test_accuracy.py):",
        "",
        *_table(r, _METNET_STOCH, steps),
        "",
    ]
    # preserve the sections owned by the other gate tools across reruns
    # (tools/horizon_gate.py's 48-step section, tools/accuracy_256.py's
    # production-geometry section, then tools/gan_gate.py's)
    gan_tail = ""
    markers = ("## 48-step horizon", "## 256px production geometry",
               "## GAN family")
    if os.path.exists("docs/ACCURACY.md"):
        with open("docs/ACCURACY.md") as f:
            doc = f.read()
        idxs = [doc.index(m) for m in markers if m in doc]
        if idxs:
            gan_tail = "\n" + doc[min(idxs):]
    with open("docs/ACCURACY.md", "w") as f:
        f.write("\n".join(lines) + gan_tail)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--arms", default=None,
                   help=f"comma list of arms to (re)run; default: all of "
                        f"{','.join(ALL_ARMS)}. Results merge into the "
                        f"existing docs/accuracy_results.json")
    a = p.parse_args()
    main(a.arms.split(",") if a.arms else None)
