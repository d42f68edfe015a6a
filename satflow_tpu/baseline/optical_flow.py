"""Optical-flow baseline: per-channel, per-lead-time MSE vs persistence.

Parity harness for reference satflow/baseline/optical_flow.py: for every batch,
compute dense flow between the two most recent past frames per channel
(:48-53), warp the current frame forward ``forecast_steps`` times (:67-74), and
accumulate MSE per channel × per lead time against the true future frames —
alongside the persistence baseline (repeat the current frame, :75-80). Loss
arrays are dumped as ``.npy`` (:85-90). Published numbers to match: flow MSE
0.1541 vs persistence 0.1566 (satflow/baseline/README.md:13-14).

TPU redesign: the flow solve (when using the JAX Horn–Schunck path) and the
48-step warp rollout + MSE reduction run as compiled on-device programs; only
the optional OpenCV-Farneback flow (kept for numerical parity with the
published numbers) runs on host.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from satflow_tpu.data import consts
from satflow_tpu.ops.flow import farneback_flow, horn_schunck_flow, rollout_warp


def run_baseline(
    dataset,
    forecast_steps: int = 48,
    flow_method: str = "farneback",
    flow_channel: Optional[int] = None,
    output_dir: Optional[str] = None,
    max_batches: Optional[int] = None,
    target_view=None,
) -> Dict[str, np.ndarray]:
    """Run the flow + persistence baseline over a dataset.

    dataset yields (x, y) dicts with ``sat_data`` (B, T, H, W, C) in x and
    (B, F, H, W, C) in y. ``flow_channel``: compute flow on one channel (the
    reference's HRV-then-apply-to-masks mode, baseline/README.md:18-22) or per
    channel when None.

    ``target_view``: optional callable (F, H, W) -> (F, H', W') applied to the
    warped/persistence predictions AND the truth before scoring. This is how
    a model that predicts a coarser target grid (MetNet: center crop at 1/16
    resolution) gets an apples-to-apples flow arm: the flow is solved and
    warped at INPUT resolution — where the motion is super-pixel and
    recoverable — and only the scoring happens on the pooled target grid
    (reference baseline/README.md:18-22 computes flow on full-res HRV and
    applies it to the scored targets the same way). Solving flow directly on
    a pooled 4x4 grid instead degenerates to zero flow ≡ persistence.

    Returns dict with ``flow_loss`` and ``baseline_loss`` arrays of shape
    (C, forecast_steps) plus scalar means.
    """
    total_flow = None
    total_persist = None
    count = 0

    for bi, (x, y) in enumerate(dataset):
        if max_batches is not None and bi >= max_batches:
            break
        past = np.asarray(x[consts.SATELLITE_DATA])  # (B, T, H, W, C)
        future = np.asarray(y[consts.SATELLITE_DATA])  # (B, F, H, W, C)
        b, _, h, w, c = past.shape
        if total_flow is None:
            # accumulator geometry is fixed by the FIRST batch; later batches
            # accumulate the same number of lead times (min with their own F)
            steps = min(forecast_steps, future.shape[1])
            total_flow = np.zeros((c, steps), dtype=np.float64)
            total_persist = np.zeros((c, steps), dtype=np.float64)
        steps = min(steps, future.shape[1])
        if steps < total_flow.shape[1]:
            raise ValueError(
                f"batch {bi} has only {future.shape[1]} future frames; the "
                f"study accumulates {total_flow.shape[1]} lead times (set "
                "forecast_steps to the dataset minimum)"
            )

        def _solve_flow(prev2d, curr2d):
            if flow_method == "farneback":
                return farneback_flow(truth_dtype(prev2d), truth_dtype(curr2d))
            return np.asarray(
                horn_schunck_flow(jnp.asarray(prev2d), jnp.asarray(curr2d))
            )

        for sample in range(b):
            prev_f = past[sample, -2]
            curr_f = past[sample, -1]
            truth = future[sample, :steps]  # (F, H, W, C)
            # flow_channel mode (the reference's compute-on-HRV-apply-to-all,
            # baseline/README.md:18-22): ONE flow solve per sample, not per
            # channel — the field is identical across the channel loop
            shared_flow = (
                _solve_flow(prev_f[..., flow_channel], curr_f[..., flow_channel])
                if flow_channel is not None else None
            )
            for ch in range(c):
                flow = (shared_flow if shared_flow is not None
                        else _solve_flow(prev_f[..., ch], curr_f[..., ch]))
                warped = np.asarray(
                    rollout_warp(jnp.asarray(curr_f[..., ch]), jnp.asarray(flow), steps)
                )  # (steps, H, W)
                persisted = np.broadcast_to(
                    curr_f[None, ..., ch], (steps, h, w)
                )
                truth_ch = truth[..., ch]
                if target_view is not None:
                    warped = np.asarray(target_view(warped))
                    persisted = np.asarray(target_view(np.ascontiguousarray(persisted)))
                    truth_ch = np.asarray(target_view(truth_ch))
                total_flow[ch] += np.mean(
                    (warped - truth_ch) ** 2, axis=(1, 2)
                )
                total_persist[ch] += np.mean(
                    (persisted - truth_ch) ** 2, axis=(1, 2)
                )
            count += 1

    if total_flow is None:
        raise ValueError(
            "run_baseline got an empty dataset (or max_batches=0) — "
            "nothing to score"
        )
    flow_loss = total_flow / max(count, 1)
    persist_loss = total_persist / max(count, 1)
    results = {
        "flow_loss": flow_loss,
        "baseline_loss": persist_loss,
        "flow_mean": float(flow_loss.mean()),
        "baseline_mean": float(persist_loss.mean()),
    }
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        np.save(os.path.join(output_dir, "flow_loss.npy"), flow_loss)
        np.save(os.path.join(output_dir, "baseline_loss.npy"), persist_loss)
    return results


def truth_dtype(a: np.ndarray) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def main():  # pragma: no cover - CLI convenience
    import argparse

    from satflow_tpu.data.fake import AdvectionDataset

    p = argparse.ArgumentParser(description="Optical flow baseline harness")
    p.add_argument("--steps", type=int, default=48)
    p.add_argument("--method", default="farneback", choices=["farneback", "horn_schunck"])
    p.add_argument("--output", default="baseline_out")
    p.add_argument("--batches", type=int, default=4)
    args = p.parse_args()
    ds = AdvectionDataset(batch_size=4, width=64, height=64,
                          history_minutes=30, forecast_minutes=args.steps * 5)
    res = run_baseline(ds, args.steps, args.method, output_dir=args.output,
                       max_batches=args.batches)
    print(f"Avg Total Loss: {res['flow_mean']}, Avg Baseline Loss: {res['baseline_mean']}")


if __name__ == "__main__":
    main()
