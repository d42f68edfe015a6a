"""GAN quality study: train CloudGAN + a small DGMR on decaying advection and
measure them against persistence/flow — the generative-family analog of
tools/accuracy_gate.py (VERDICT r2 #1: the GAN lineage is the reference's
research centerpiece, reference satflow/models/cloudgan.py:244-248,335-362 and
configs/model/nowcasting_gan.yaml:1-15, yet r2 had zero quality evidence).

Writes docs/gan_results.json and appends/refreshes the GAN section in
docs/ACCURACY.md. Gated (smaller geometry) by tests/test_accuracy.py.

Usage: python tools/gan_gate.py          (TPU)
       env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/gan_gate.py
"""

from __future__ import annotations

import json
import os

import numpy as np

# The headline study geometry (tools/accuracy_gate.py DS_KW, single-channel).
DS_KW = dict(batch_size=8, width=32, height=32, number_sat_channels=1,
             history_minutes=15, forecast_minutes=60, velocity=(1, 2),
             decay=0.93, n_blobs=4)
STEPS = 12


def make_dm(length=12, stochastic=False):
    from satflow_tpu.data.datamodule import SatFlowDataModule
    from satflow_tpu.data.fake import (
        DecayingAdvectionDataset,
        StochasticAdvectionDataset,
    )

    cls = StochasticAdvectionDataset if stochastic else DecayingAdvectionDataset

    class DecayDM(SatFlowDataModule):
        def __init__(self, **kwargs):
            super().__init__(fake_data=True, num_workers=0, shard=False, **kwargs)

        def _dataset(self, split, n):
            seed = {"train": 0, "validation": 100, "test": 200}[split]
            return cls(length=length, seed=seed, **DS_KW)

    return DecayDM()


def main():
    import jax

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

    # --- CloudGAN: ConvLSTM generator, lsgan + lambda*L1 --------------------
    # 20 epochs / lr 1e-3: at 30 epochs lr 2e-3 the lsgan discriminator ran
    # away to d_loss ~1e-5 (won completely) while the generator result was
    # unchanged — the shorter schedule keeps the adversarial game live.
    epochs_cg = 20
    cloudgan = create_model(
        "cloudgan", forecast_steps=STEPS, input_channels=1,
        channels_per_timestep=1, generator_model="convlstm",
        num_filters=32, lr=1e-3, lambda_l1=100.0, loss="lsgan",
    )
    trainer = Trainer(max_epochs=epochs_cg, log_every_n_steps=1000, seed=0)
    trainer.fit(cloudgan, make_dm())
    g_vars = {"params": trainer.state.g_params,
              **trainer.state.model_state.get("g", {})}
    curves = evaluate_model(cloudgan, g_vars, eval_ds, max_batches=3,
                            compute_ms_ssim=False)
    results["cloudgan"] = {
        "mse_t": np.mean(curves["mse"], axis=0).tolist(),
        "mse": float(np.mean(curves["mse"])),
        "d_loss": float(trainer.callback_metrics["train/d_loss"]),
        "g_adv_loss": float(trainer.callback_metrics["train/g_adv_loss"]),
        "epochs": epochs_cg,
    }
    print("cloudgan mse", results["cloudgan"]["mse"],
          "d_loss", results["cloudgan"]["d_loss"])

    # --- DGMR (NowcastingGAN): probabilistic, 3 MC samples ------------------
    # Trained/evaluated on STOCHASTIC futures (future velocity redrawn at the
    # forecast boundary) so inter-sample variance is a meaningful collapse
    # probe; an oracle 3-mode sampler calibrates the scale. Recipe = the best
    # of six tuning runs that keeps the discriminator healthy (d_loss bounded
    # away from 0) while the sample mean beats persistence.
    from satflow_tpu.data.fake import StochasticAdvectionDataset

    eval_sto = StochasticAdvectionDataset(length=3, seed=300, **DS_KW)
    base_sto = run_baseline(eval_sto, forecast_steps=STEPS,
                            flow_method="farneback", max_batches=3)
    results["persistence@stochastic"] = {
        "mse_t": np.mean(base_sto["baseline_loss"], axis=0).tolist(),
        "mse": float(np.mean(base_sto["baseline_loss"])),
    }
    results["oracle_sample_std"] = _oracle_std(eval_sto)

    epochs_dg = 150
    dgmr = create_model(
        "nowcastinggan", forecast_steps=STEPS, input_channels=1,
        output_shape=DS_KW["width"], context_channels=24, latent_channels=48,
        disc_channels=6, num_samples=3, grid_lambda=20.0, disc_steps=1,
        gen_lr=2e-4, disc_lr=5e-5,
    )
    trainer = Trainer(max_epochs=epochs_dg, log_every_n_steps=1000, seed=0,
                      limit_val_batches=1)
    trainer.fit(dgmr, make_dm(stochastic=True))
    g_vars = {"params": trainer.state.g_params,
              **trainer.state.model_state.get("g", {})}
    mses, stds = [], []
    mse_t = 0.0
    for bi, batch in enumerate(eval_sto):
        if bi >= 3:
            break
        x, y = dgmr.prepare_batch(batch)
        samples, _ = dgmr._sample(g_vars, x, jax.random.PRNGKey(42 + bi),
                                  False, dgmr.num_samples)
        samples = np.asarray(samples)
        ynp = np.asarray(y)
        mean_pred = samples.mean(axis=1)
        mses.append(((mean_pred - ynp) ** 2).mean())
        mse_t = mse_t + ((mean_pred - ynp) ** 2).mean(axis=(0, 2, 3, 4))
        stds.append(samples.std(axis=1).mean())
    results["dgmr"] = {
        "mse_t": (mse_t / 3).tolist(),
        "mse": float(np.mean(mses)),
        "sample_std": float(np.mean(stds)),
        "d_loss": float(trainer.callback_metrics["train/d_loss"]),
        "epochs": epochs_dg,
        "num_samples": dgmr.num_samples,
    }
    print("dgmr mean-sample mse", results["dgmr"]["mse"],
          "sample_std", results["dgmr"]["sample_std"],
          "d_loss", results["dgmr"]["d_loss"])

    os.makedirs("docs", exist_ok=True)
    with open("docs/gan_results.json", "w") as f:
        json.dump(results, f, indent=2)
    _write_md(results)
    print(json.dumps({
        k: (v.get("mse") if isinstance(v, dict) else v)
        for k, v in results.items()
    }))


_MARKER = "## GAN family — CloudGAN & DGMR"


def _oracle_std(eval_ds):
    """Inter-sample std of a PERFECT 3-mode sampler on the stochastic set."""
    x, _ = eval_ds[0]
    last = np.asarray(x["sat_data"])[:, -1]
    dy, dx = DS_KW["velocity"]
    modes = []
    for ddy, ddx in ((0, -2), (0, 0), (0, 2)):
        cur = last.copy()
        seq = []
        for _ in range(STEPS):
            cur = np.roll(np.roll(cur, dy + ddy, axis=1), dx + ddx, axis=2)
            cur = cur * DS_KW["decay"]
            seq.append(cur)
        modes.append(np.stack(seq, axis=1))
    return float(np.stack(modes, axis=1).std(axis=1).mean())


def _write_md(r):
    lines = [
        _MARKER,
        "",
        "The reference's generative lineage (CloudGAN's two-optimizer loop,",
        "reference cloudgan.py:244-248; DGMR per",
        "configs/model/nowcasting_gan.yaml) trained to a measured result.",
        "CloudGAN is conditional-deterministic and runs on the headline",
        "study geometry; DGMR is probabilistic and runs on STOCHASTIC",
        "futures (future velocity redrawn at the forecast boundary) so that",
        "inter-sample variance is a meaningful collapse probe — on the",
        "deterministic sets zero variance is optimal. Reproduce:",
        "`python tools/gan_gate.py`; gated by `tests/test_accuracy.py`.",
        "",
        "| Method | Mean MSE | D loss (final) | sample std |",
        "|---|---|---|---|",
        f"| persistence | {r['persistence']['mse']:.5f} | - | - |",
        f"| optical_flow | {r['optical_flow']['mse']:.5f} | - | - |",
        f"| cloudgan (gen) | {r['cloudgan']['mse']:.5f} | "
        f"{r['cloudgan']['d_loss']:.3f} | - (deterministic) |",
        f"| persistence@stochastic | {r['persistence@stochastic']['mse']:.5f}"
        " | - | - |",
        f"| dgmr (mean of {r['dgmr']['num_samples']}, @stochastic) | "
        f"{r['dgmr']['mse']:.5f} | {r['dgmr']['d_loss']:.3f} | "
        f"{r['dgmr']['sample_std']:.5f} |",
        f"| oracle 3-mode sampler | - | - | {r['oracle_sample_std']:.5f} |",
        "",
        "**DGMR diversity: a documented negative result.** Across six tuning",
        "runs (grid_lambda 10-100, disc_lr 3e-5-2e-4, disc_steps 1-2,",
        "latent_channels 48-96) the trained generator's sample mean reliably",
        "beats persistence, but its Monte-Carlo draws collapse to",
        f"~{r['dgmr']['sample_std']:.0e} std vs the oracle's "
        f"{r['oracle_sample_std']:.3f} —",
        "classic small-data GAN mode collapse (mid-training checkpoints show",
        "std up to 0.05, which decays as the regularized mean converges).",
        "The production-scale DGMR relies on data diversity the synthetic",
        "set cannot provide; the collapse is measured and reported rather",
        "than hidden behind a deterministic dataset where std ~ 0 would be",
        "vacuously 'correct'.",
        "",
        "| t | persistence | optical_flow | cloudgan | dgmr@stochastic |",
        "|---|---|---|---|---|",
    ]
    for t in range(STEPS):
        lines.append(
            f"| {t} | {r['persistence']['mse_t'][t]:.5f} | "
            f"{r['optical_flow']['mse_t'][t]:.5f} | "
            f"{r['cloudgan']['mse_t'][t]:.5f} | {r['dgmr']['mse_t'][t]:.5f} |"
        )
    lines.append("")
    path = "docs/ACCURACY.md"
    with open(path) as f:
        doc = f.read()
    if _MARKER in doc:
        doc = doc[: doc.index(_MARKER)]
    with open(path, "w") as f:
        f.write(doc.rstrip("\n") + "\n\n" + "\n".join(lines))


if __name__ == "__main__":
    main()
