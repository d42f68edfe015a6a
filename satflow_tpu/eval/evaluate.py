"""Checkpoint evaluation: MSE / SSIM / MS-SSIM per lead time (and per channel).

The acceptance gate of the rebuild (BASELINE.md): model quality is judged on
per-lead-time curves against the optical-flow/persistence baselines, and the
speed target only counts "at matching MS-SSIM". This harness produces those
curves for any registered model checkpoint:

    python -m satflow_tpu.eval.evaluate --checkpoint checkpoints/best \
        --dataset advection --batches 4 --output eval_out

Outputs ``mse.npy`` (C, T), ``ssim.npy`` (T,), ``ms_ssim.npy`` (T,) plus a
JSON summary — the shape-compatible analog of the baseline harness's .npy
dumps (reference satflow/baseline/optical_flow.py:85-90).

The metric computation is one jitted function per batch: forward + all metric
reductions compile together, so evaluation runs at inference speed.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from satflow_tpu.ops.ssim import ms_ssim, ssim


def evaluate_model(
    model,
    variables,
    dataset: Iterable,
    max_batches: Optional[int] = None,
    compute_ms_ssim: bool = True,
) -> Dict[str, np.ndarray]:
    """Per-lead-time metric curves for a model over a dataset.

    Returns dict with ``mse`` (C, T), ``ssim`` (T,), optionally ``ms_ssim``
    (T,), and scalar means.
    """

    @jax.jit
    def batch_metrics(variables, x, y):
        y_hat = model.forward(variables, x)
        t = y.shape[1]
        # (C, T) mse: mean over batch/space per channel per lead time
        se = jnp.square(y_hat - y)
        mse_ct = jnp.moveaxis(jnp.mean(se, axis=(0, 2, 3)), 0, 1)  # (C, T)
        ssim_t = jnp.stack([ssim(y_hat[:, i], y[:, i]) for i in range(t)])
        out = {"mse": mse_ct, "ssim": ssim_t}
        if compute_ms_ssim:
            out["ms_ssim"] = jnp.stack(
                [ms_ssim(y_hat[:, i], y[:, i]) for i in range(t)]
            )
        return out

    sums: Dict[str, np.ndarray] = {}
    count = 0
    for bi, batch in enumerate(dataset):
        if max_batches is not None and bi >= max_batches:
            break
        x, y = model.eval_batch(batch)
        # x is a plain array for single-modality models, a modality dict for
        # Perceiver-family models — tree_map covers both
        x = jax.tree_util.tree_map(jnp.asarray, x)
        metrics = jax.device_get(batch_metrics(variables, x, jnp.asarray(y)))
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + np.asarray(v)
        count += 1

    if not count:
        raise ValueError("evaluate_model got an empty dataset (or "
                         "max_batches=0) — nothing to score")
    results = {k: v / count for k, v in sums.items()}
    results["mse_mean"] = float(results["mse"].mean())
    results["ssim_mean"] = float(results["ssim"].mean())
    if compute_ms_ssim:
        results["ms_ssim_mean"] = float(results["ms_ssim"].mean())
    return results


def save_results(results: Dict[str, np.ndarray], output_dir: str) -> None:
    os.makedirs(output_dir, exist_ok=True)
    summary = {}
    for k, v in results.items():
        if isinstance(v, np.ndarray):
            np.save(os.path.join(output_dir, f"{k}.npy"), v)
        else:
            summary[k] = v
    with open(os.path.join(output_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


def main():  # pragma: no cover - CLI convenience
    import argparse

    from satflow_tpu.core.registry import create_model
    import satflow_tpu.models  # noqa: F401
    from satflow_tpu.data.fake import AdvectionDataset, FakeDataset

    p = argparse.ArgumentParser(description="Evaluate a checkpoint")
    p.add_argument("--checkpoint", required=True, help="orbax checkpoint dir")
    p.add_argument("--dataset", default="advection", choices=["advection", "fake"])
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--channels", type=int, default=12)
    p.add_argument("--history-minutes", type=int, default=30,
                   help="past-window length; MUST match the checkpoint's "
                        "training history for models whose params bake in "
                        "the context length (DGMR's conditioning stack)")
    p.add_argument("--output", default="eval_out")
    p.add_argument("--ensemble", type=int, default=0, metavar="M",
                   help="for sampling models (DGMR): draw M Monte-Carlo "
                        "samples per forecast and report ensemble CRPS + "
                        "spread instead of the deterministic curves")
    args = p.parse_args()

    model = create_model(f"local:{args.checkpoint}")
    ds_cls = AdvectionDataset if args.dataset == "advection" else FakeDataset
    ds = ds_cls(
        batch_size=4, width=args.size, height=args.size,
        number_sat_channels=args.channels,
        history_minutes=args.history_minutes,
        forecast_minutes=model.forecast_steps * 5, length=args.batches,
    )
    if args.ensemble:
        from satflow_tpu.eval.probabilistic import evaluate_ensemble

        variables = model.restored_variables
        if "generator" in (variables.get("params") or {}):
            # GAN checkpoints carry both networks; sampling needs the
            # generator subtree (same extraction as serve/session.py)
            variables = {"params": variables["params"]["generator"],
                         **(variables.get("g") or {})}
        results = evaluate_ensemble(
            model, variables, ds, max_batches=args.batches,
            num_samples=args.ensemble,
        )
        os.makedirs(args.output, exist_ok=True)
        for k in ("crps", "mse"):
            np.save(os.path.join(args.output, f"{k}.npy"),
                    np.asarray(results[k]))
    else:
        results = evaluate_model(
            model, model.restored_variables, ds, args.batches
        )
        save_results(results, args.output)
    print(json.dumps({k: v for k, v in results.items() if not isinstance(v, np.ndarray)}))


if __name__ == "__main__":
    main()
