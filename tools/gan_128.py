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

Round-5 extension: `--finetune-steps N` applies the fair-CRPS generator
fine-tune (train/probabilistic.py, the recipe that restored spread to 104%
of oracle at the 32px study geometry) to the CRPS-selected checkpoint AT
THIS geometry, recording the CRPS-vs-spread-vs-MSE frontier. Trained
generator state is pickled to `--state` so the fine-tune can be re-run or
extended without retraining (`--skip-train`).

Usage (TPU): python tools/gan_128.py [--epochs 60] [--batch 4]
             [--context-channels 384] [--latent-channels 768]
             [--finetune-steps 800] [--finetune-m 6] [--skip-train]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

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


def main(epochs, batch, context_channels, latent_channels,
         finetune_steps=0, finetune_m=6, finetune_lr=1e-4,
         finetune_every=200, skip_train=False, from_finetuned=False,
         state_path="/tmp/gan128_state.pkl"):
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

    common = {
        "epochs": epochs, "batch": batch, "num_samples": dgmr.num_samples,
        "context_channels": context_channels,
        "latent_channels": latent_channels,
    }

    saved = None
    if skip_train:
        # reuse the trained generator state from a prior invocation —
        # the dgmr@128px / dgmr_crps_selected@128px rows stay as committed
        with open(state_path, "rb") as f:
            saved = pickle.load(f)
        sel_g_vars = jax.tree_util.tree_map(jnp.asarray, saved["selected"])
        sel_epoch = saved["selected_epoch"]
    else:
        sel_g_vars, sel_epoch = _train(
            dgmr, epochs, batch, results, common, _row, state_path,
            Callback, Trainer, StochasticAdvectionDataset, crps_ensemble)

    if finetune_steps:
        # Fair-CRPS generator fine-tune at the reference geometry: the
        # 32px recipe (gan_gate.py / train/probabilistic.py) applied to
        # the CRPS-selected 128px checkpoint. Non-param collections
        # (spectral-norm u/v) frozen; warmup-cosine; the frontier (CRPS /
        # spread / MSE every --finetune-every steps) goes in the doc.
        from satflow_tpu.train.probabilistic import crps_finetune

        # --from-finetuned continues a previous leg: start from the pickled
        # fine-tuned state and merge frontiers (step numbers cumulative), so
        # a long schedule can run as interruption-safe legs.
        start_vars, prev_steps, prev_frontier = sel_g_vars, 0, []
        if from_finetuned:
            if saved is None:
                with open(state_path, "rb") as f:
                    saved = pickle.load(f)
            start_vars = jax.tree_util.tree_map(
                jnp.asarray, saved["finetuned"])
            prev_steps = saved.get("finetuned_steps", 0)
            prev_frontier = list(
                results.get("dgmr_crps_finetuned@128px", {})
                .get("frontier", []))

        train_sto = StochasticAdvectionDataset(
            length=12, seed=0, **{**DS128, "batch_size": batch})
        ft_vars, ft_hist = crps_finetune(
            dgmr, start_vars, list(train_sto), steps=finetune_steps,
            num_samples=finetune_m, lr=finetune_lr, lr_schedule="cosine",
            eval_every=finetune_every, eval_fn=_row, seed=prev_steps,
        )
        results["dgmr_crps_finetuned@128px"] = {
            **_row(ft_vars),
            "from_epoch": sel_epoch,
            "finetune_steps": prev_steps + finetune_steps,
            "finetune_num_samples": finetune_m,
            "finetune_lr": finetune_lr,
            "fair_crps_history": list(ft_hist),
            "frontier": prev_frontier + [
                {"step": prev_steps + s, "crps": e["crps"],
                 "sample_std": e["sample_std"],
                 "mse": e["mse"], "crps_fair_m8": e.get("crps_fair_m8")}
                for s, e in ft_hist.frontier
            ],
            **common,
        }
        state = {}
        if os.path.exists(state_path):
            with open(state_path, "rb") as f:
                state = pickle.load(f)
        state["finetuned"] = jax.device_get(ft_vars)
        state["finetuned_steps"] = prev_steps + finetune_steps
        with open(state_path, "wb") as f:
            pickle.dump(state, f)
        m = results["dgmr_crps_finetuned@128px"]
        print("dgmr@128px FINETUNED",
              {k: m[k] for k in ("mse", "crps", "crps_fair_m8",
                                 "sample_std")}, flush=True)

    os.makedirs("docs", exist_ok=True)
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=2)
    _write_md(results)


def _train(dgmr, epochs, batch, results, common, _row, state_path,
           Callback, Trainer, StochasticAdvectionDataset, crps_ensemble):
    import jax
    import jax.numpy as jnp

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

    g_vars = {"params": trainer.state.g_params,
              **trainer.state.model_state.get("g", {})}
    results["dgmr@128px"] = {
        **_row(g_vars),
        "d_loss": float(trainer.callback_metrics["train/d_loss"]),
        **common,
    }
    sel = selector.best
    sel_g_vars = jax.tree_util.tree_map(jnp.asarray, sel["g_vars"])
    results["dgmr_crps_selected@128px"] = {
        **_row(sel_g_vars),
        "selected_epoch": sel["epoch"],
        "trajectory": selector.trajectory[::5],
        **common,
    }
    print("dgmr@128px FINAL", {k: v for k, v in results["dgmr@128px"].items()
                               if k != "mse_t"}, flush=True)
    print("dgmr@128px SELECTED (epoch", sel["epoch"], ")",
          {k: v for k, v in results["dgmr_crps_selected@128px"].items()
           if k not in ("mse_t", "trajectory")}, flush=True)
    with open(state_path, "wb") as f:
        pickle.dump({"selected": sel["g_vars"],
                     "selected_epoch": sel["epoch"],
                     "final": jax.device_get(g_vars)}, f)
    return sel_g_vars, sel["epoch"]


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
    for name in ("dgmr@128px", "dgmr_crps_selected@128px",
                 "dgmr_crps_finetuned@128px"):
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
    ft = r.get("dgmr_crps_finetuned@128px")
    if ft:
        o_std = r["oracle_sample_std@128px"]
        lines += [
            "",
            f"Fair-CRPS fine-tune at this geometry ({ft['finetune_steps']} "
            f"generator-only Adam steps, M={ft['finetune_num_samples']}, "
            f"warmup-cosine lr {ft['finetune_lr']:g}, from the selected "
            f"epoch-{ft['from_epoch']} checkpoint — the 32px study's "
            "spread-restoration recipe applied at 128px). Frontier "
            "(evaluated on the held-out stochastic set):",
            "",
            "| step | fair CRPS (M=8) | sample std | % of oracle std "
            "| mean MSE |",
            "|---|---|---|---|---|",
        ]
        for row in ft["frontier"]:
            lines.append(
                f"| {row['step']} | {row['crps_fair_m8']:.4f} | "
                f"{row['sample_std']:.1e} | "
                f"{100 * row['sample_std'] / o_std:.0f}% | "
                f"{row['mse']:.5f} |")
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
    p.add_argument("--finetune-steps", type=int, default=0)
    p.add_argument("--finetune-m", type=int, default=6)
    p.add_argument("--finetune-lr", type=float, default=1e-4)
    p.add_argument("--finetune-every", type=int, default=200)
    p.add_argument("--skip-train", action="store_true",
                   help="load generator state from --state instead of "
                        "training (keeps the committed train rows)")
    p.add_argument("--from-finetuned", action="store_true",
                   help="continue the fine-tune from the pickled "
                        "fine-tuned state (cumulative frontier)")
    p.add_argument("--state", default="/tmp/gan128_state.pkl")
    a = p.parse_args()
    main(a.epochs, a.batch, a.context_channels, a.latent_channels,
         finetune_steps=a.finetune_steps, finetune_m=a.finetune_m,
         finetune_lr=a.finetune_lr, finetune_every=a.finetune_every,
         skip_train=a.skip_train, from_finetuned=a.from_finetuned,
         state_path=a.state)
