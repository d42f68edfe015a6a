"""DGMR quality study at the REFERENCE geometry: 128px, 24 lead steps.

The GAN study (tools/gan_gate.py) runs at the 32px study geometry; the only
prior 128px evidence for the probabilistic family was a train-step
feasibility smoke (tests/test_tpu_smoke.py::test_tpu_dgmr_reference_scale_
train_step) and the split-D/G throughput row (docs/DESIGN.md). This tool
produces the missing QUALITY number at the geometry the reference's flagship
GAN config actually ships (reference configs/model/nowcasting_gan.yaml:2-4 —
forecast_steps 24, output_shape 128; :11 num_samples 3; :10,12 grid_lambda
20, hinge + dual discriminators; :5-6 gen_lr 5e-5 / disc_lr 2e-4):

- train DGMR at 128px/24 steps on StochasticAdvectionDataset (the
  multi-modal-future regime the generative family exists for) to a fixed
  budget on one TPU chip, split D/G jits (the compile-feasible mode at this
  geometry, docs/DESIGN.md DGMR note),
- CRPS checkpoint selection over the training trajectory (the same
  diversity-aware selection the 32px study uses),
- score ensemble-mean MSE / CRPS (reference-protocol M=3 + fair M=8) /
  sample spread against persistence and the oracle 3-mode sampler AT THIS
  GEOMETRY.

Writes docs/gan_128.json + a "## DGMR at the reference geometry" section in
docs/ACCURACY.md. Gated by tests/test_accuracy.py (artifact) and a
hardware-marked smoke in tests/test_tpu_smoke.py.

Usage (TPU): python tools/gan_128.py [--epochs 60] [--batch 4]
             [--context-channels 384] [--latent-channels 768]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

# 128px analog of the 32px study geometry: velocity (1,2)*24 = (24,48)px
# displacement (super-pixel, no torus wrap inside the horizon at 128px);
# future vx modes {0,2,4} separate by 48px at t=23. decay 0.965^24 = 0.43
# keeps the intensity signal alive across the horizon; 16 blobs ~ the 32px
# study's coverage scaled to the 16x area.
DS128 = dict(batch_size=4, width=128, height=128, number_sat_channels=1,
             history_minutes=15, forecast_minutes=120, velocity=(1, 2),
             decay=0.965, n_blobs=16)
STEPS = 24
EVAL_BATCHES = 2

RESULTS_PATH = "docs/gan_128.json"
MARKER = "## DGMR at the reference geometry (128px, 24 steps)"


def make_dm(batch):
    from satflow_tpu.data.datamodule import SatFlowDataModule
    from satflow_tpu.data.fake import StochasticAdvectionDataset

    class StochDM(SatFlowDataModule):
        def __init__(self, **kwargs):
            super().__init__(fake_data=True, num_workers=0, shard=False,
                             **kwargs)

        def _dataset(self, split, n):
            seed = {"train": 0, "validation": 100, "test": 200}[split]
            return StochasticAdvectionDataset(
                length=12, seed=seed, **{**DS128, "batch_size": batch})

    return StochDM()


def _oracle_modes(x_last):
    """(B, 3, T, H, W, C) rollouts of the 3 future-velocity modes."""
    dy, dx = DS128["velocity"]
    modes = []
    for ddy, ddx in ((0, -2), (0, 0), (0, 2)):
        cur = np.asarray(x_last).copy()
        seq = []
        for _ in range(STEPS):
            cur = np.roll(np.roll(cur, dy + ddy, axis=1), dx + ddx, axis=2)
            cur = cur * DS128["decay"]
            seq.append(cur)
        modes.append(np.stack(seq, axis=1))
    return np.stack(modes, axis=1)


def _oracle_std_and_crps(eval_ds):
    """Spread + CRPS of a PERFECT 3-mode sampler on the stochastic set."""
    import jax.numpy as jnp

    from satflow_tpu.eval.probabilistic import crps_ensemble

    stds, crpss = [], []
    for bi, (x, y) in enumerate(eval_ds):
        if bi >= EVAL_BATCHES:
            break
        ens = _oracle_modes(np.asarray(x["sat_data"])[:, -1])
        stds.append(ens.std(axis=1).mean())
        crpss.append(float(np.mean(crps_ensemble(
            jnp.asarray(ens), jnp.asarray(np.asarray(y["sat_data"]))))))
    return float(np.mean(stds)), float(np.mean(crpss))


def _persistence_rows(eval_ds):
    """Persistence MSE curve + CRPS (= MAE, the M=1 ensemble)."""
    import jax.numpy as jnp

    from satflow_tpu.eval.probabilistic import crps_deterministic

    mses, crpss = [], []
    for bi, (x, y) in enumerate(eval_ds):
        if bi >= EVAL_BATCHES:
            break
        last = np.asarray(x["sat_data"])[:, -1]
        fut = np.asarray(y["sat_data"])
        persist = np.broadcast_to(
            last[:, None], (last.shape[0], STEPS) + last.shape[1:])
        mses.append(((persist - fut) ** 2).mean(axis=(0, 2, 3, 4)))
        crpss.append(float(np.mean(crps_deterministic(
            jnp.asarray(persist.copy()), jnp.asarray(fut)))))
    return np.mean(mses, axis=0), float(np.mean(crpss))


def main(epochs, batch, context_channels, latent_channels):
    import jax
    import jax.numpy as jnp

    from satflow_tpu.core.registry import create_model
    from satflow_tpu.core.utils import setup_compilation_cache
    from satflow_tpu.data.fake import StochasticAdvectionDataset
    from satflow_tpu.eval.probabilistic import crps_ensemble, evaluate_ensemble
    from satflow_tpu.train.callbacks import Callback
    from satflow_tpu.train.engine import Trainer
    import satflow_tpu.models  # noqa: F401

    setup_compilation_cache()
    eval_ds = StochasticAdvectionDataset(length=EVAL_BATCHES, seed=300,
                                         **DS128)

    results = {}
    if os.path.exists(RESULTS_PATH):
        with open(RESULTS_PATH) as f:
            results = json.load(f)

    mse_t, p_crps = _persistence_rows(eval_ds)
    results["persistence@128px"] = {
        "mse_t": mse_t.tolist(), "mse": float(mse_t.mean()), "crps": p_crps,
    }
    o_std, o_crps = _oracle_std_and_crps(eval_ds)
    results["oracle_sample_std@128px"] = o_std
    results["oracle_crps@128px"] = o_crps
    print("persistence mse", results["persistence@128px"]["mse"],
          "crps", p_crps, "| oracle std", o_std, "crps", o_crps, flush=True)

    # Reference flagship config at its published scale (nowcasting_gan.yaml:
    # lrs, grid_lambda, num_samples; latent 768 / context 384 is the scale
    # the feasibility smoke validates on one v5e chip).
    dgmr = create_model(
        "nowcastinggan", forecast_steps=STEPS, input_channels=1,
        output_shape=DS128["width"], context_channels=context_channels,
        latent_channels=latent_channels, num_samples=3, grid_lambda=20.0,
        disc_steps=2, gen_lr=5e-5, disc_lr=2e-4,
    )

    class CRPSSelect(Callback):
        """Diversity-aware checkpoint selection (see tools/gan_gate.py —
        CRPS penalizes both miss AND collapse; one jitted probe with the
        weights as an argument so epochs don't recompile the sampler)."""

        def __init__(self, model, ds):
            self.model = model
            self.batch = ds[0]
            self.best = None
            self.trajectory = []

            def _probe(g_vars, x, y, rng):
                samples, _ = model._sample(g_vars, x, rng, False,
                                           model.num_samples)
                return (jnp.mean(crps_ensemble(samples, y)),
                        jnp.mean(jnp.std(samples, axis=1)))

            self._probe = jax.jit(_probe)

        def on_validation_end(self, engine, metrics, epoch):
            g_vars = {"params": engine.state.g_params,
                      **engine.state.model_state.get("g", {})}
            x, y = self.model.prepare_batch(self.batch)
            crps, std = self._probe(g_vars, jnp.asarray(x), jnp.asarray(y),
                                    jax.random.PRNGKey(123))
            crps, std = float(crps), float(std)
            self.trajectory.append({"epoch": epoch, "crps": crps, "std": std})
            if self.best is None or crps < self.best["crps"]:
                self.best = {"epoch": epoch, "crps": crps, "std": std,
                             "g_vars": jax.device_get(g_vars)}

    selector = CRPSSelect(dgmr, StochasticAdvectionDataset(
        length=1, seed=400, **{**DS128, "batch_size": 2}))
    trainer = Trainer(max_epochs=epochs, log_every_n_steps=1000, seed=0,
                      limit_val_batches=1, callbacks=[selector],
                      gan_step_mode="split")
    trainer.fit(dgmr, make_dm(batch))

    def _row(g_vars):
        ens = evaluate_ensemble(dgmr, g_vars, eval_ds,
                                max_batches=EVAL_BATCHES)
        ens8 = evaluate_ensemble(dgmr, g_vars, eval_ds, num_samples=8,
                                 max_batches=EVAL_BATCHES, fair=True)
        return {
            "mse_t": np.asarray(ens["mse"]).tolist(),
            "mse": ens["mse_mean"],
            "crps": ens["crps_mean"],
            "sample_std": ens["sample_std"],
            "crps_fair_m8": ens8["crps_mean"],
        }

    g_vars = {"params": trainer.state.g_params,
              **trainer.state.model_state.get("g", {})}
    common = {
        "epochs": epochs, "batch": batch, "num_samples": dgmr.num_samples,
        "context_channels": context_channels,
        "latent_channels": latent_channels,
    }
    results["dgmr@128px"] = {
        **_row(g_vars),
        "d_loss": float(trainer.callback_metrics["train/d_loss"]),
        **common,
    }
    sel = selector.best
    results["dgmr_crps_selected@128px"] = {
        **_row(jax.tree_util.tree_map(jnp.asarray, sel["g_vars"])),
        "selected_epoch": sel["epoch"],
        "trajectory": selector.trajectory[::5],
        **common,
    }
    print("dgmr@128px FINAL", {k: v for k, v in results["dgmr@128px"].items()
                               if k != "mse_t"}, flush=True)
    print("dgmr@128px SELECTED (epoch", sel["epoch"], ")",
          {k: v for k, v in results["dgmr_crps_selected@128px"].items()
           if k not in ("mse_t", "trajectory")}, flush=True)

    os.makedirs("docs", exist_ok=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=2)
    _write_md(results)


def _section(r):
    p = r["persistence@128px"]
    lines = [
        MARKER,
        "",
        "The GAN study above runs at the 32px study geometry; this arm",
        "trains DGMR at the geometry the reference's flagship GAN config",
        "ships — 128px, 24 lead steps, M=3 samples, grid_lambda 20, hinge +",
        "dual discriminators, gen_lr 5e-5 / disc_lr 2e-4 (reference",
        "configs/model/nowcasting_gan.yaml) — on StochasticAdvectionDataset",
        "(multi-modal future), split D/G jits, CRPS checkpoint selection,",
        "on one TPU chip to a fixed budget. CRPS columns: M=3 = the",
        "reference protocol's estimator; fair M=8 = unbiased estimate of",
        "the true CRPS (comparable to the oracle's exact-atom CRPS).",
        "Reproduce: `python tools/gan_128.py` (TPU); gated by",
        "`tests/test_accuracy.py` (artifact).",
        "",
        "| Method | Mean MSE | CRPS (M=3) | fair CRPS (M=8) | sample std |",
        "|---|---|---|---|---|",
        f"| persistence@128px | {p['mse']:.5f} | {p['crps']:.4f} | "
        f"{p['crps']:.4f} | - |",
    ]
    for name in ("dgmr@128px", "dgmr_crps_selected@128px"):
        if name not in r:
            continue
        m = r[name]
        lines.append(
            f"| {name} | {m['mse']:.5f} | {m['crps']:.4f} | "
            f"{m['crps_fair_m8']:.4f} | {m['sample_std']:.1e} |")
    lines.append(
        f"| oracle 3-mode sampler | - | - | {r['oracle_crps@128px']:.4f} | "
        f"{r['oracle_sample_std@128px']:.1e} |")
    m = r.get("dgmr@128px", {})
    if m:
        lines += [
            "",
            f"Budget: {m['epochs']} epochs x 12 rounds, batch {m['batch']}, "
            f"context {m['context_channels']} / latent "
            f"{m['latent_channels']} channels.",
        ]
    lines.append("")
    return "\n".join(lines)


def _write_md(r):
    """Insert/replace this tool's section at the end of docs/ACCURACY.md
    (after the GAN-family section, which ends the other tools' ranges)."""
    path = "docs/ACCURACY.md"
    doc = ""
    if os.path.exists(path):
        with open(path) as f:
            doc = f.read()
    section = _section(r) + "\n"
    if MARKER in doc:
        start = doc.index(MARKER)
        doc = doc[:start] + section  # this section owns the tail
    else:
        doc = doc.rstrip("\n") + "\n\n" + section
    with open(path, "w") as f:
        f.write(doc)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--context-channels", type=int, default=384)
    p.add_argument("--latent-channels", type=int, default=768)
    a = p.parse_args()
    main(a.epochs, a.batch, a.context_channels, a.latent_channels)
