"""Beyond-single-chip-HBM evidence for spatial (H-axis) parallelism.

AOT-compiles the SINGLE-chip ConvLSTM train step at a full-disk-scale
geometry and prints XLA's memory analysis (no execution) — demonstrating the
geometry exceeds one v5e's 16 GB HBM — then prints the per-shard activation
arithmetic for the H-sharded equivalent (trainer.spatial), whose correctness
is gated on the 8-device CPU mesh by
tests/test_sharding.py::test_spatial_trainer_fit.

Usage: python -m tools.exp_spatial_memory [--size 1024 --batch 2 --steps 12]
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--steps", type=int, default=12)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--channels", type=int, default=12)
    p.add_argument("--history", type=int, default=7)
    p.add_argument("--remat-chunk", type=int, default=6)
    p.add_argument("--shards", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from satflow_tpu.core.registry import create_model
    from satflow_tpu.core.utils import setup_compilation_cache
    import satflow_tpu.models  # noqa: F401
    from satflow_tpu.train.state import TrainState
    from satflow_tpu.train.steps import make_train_step

    setup_compilation_cache()
    model = create_model(
        "encoderdecoderconvlstm", input_channels=args.channels,
        out_channels=args.channels, forecast_steps=args.steps,
        hidden_dim=args.hidden, cell_impl="fused",
        # remat must be ON for remat_chunk to take effect (conv_lstm.py gates
        # chunked remat on `self.remat and remat_chunk > 1`); remat=False
        # with a chunk would silently measure the un-remat'ed program while
        # labeling it chunk=N
        remat=args.remat_chunk > 0, remat_chunk=args.remat_chunk,
        dtype=jnp.bfloat16, lr=1e-3,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.ShapeDtypeStruct(
        (args.batch, args.history, args.size, args.size, args.channels),
        jnp.bfloat16)
    y = jax.ShapeDtypeStruct(
        (args.batch, args.steps, args.size, args.size, args.channels),
        jnp.bfloat16)
    # init at a tiny geometry (params are geometry-independent), then lower
    # the step abstractly at the big one
    xs = jnp.zeros((1, args.history, 64, 64, args.channels), jnp.bfloat16)
    ys = jnp.zeros((1, args.steps, 64, 64, args.channels), jnp.bfloat16)
    variables = model.init_variables(rng, (xs, ys))
    params, mstate = model.split_variables(variables)
    state = TrainState.create(params, mstate, model.make_optimizer())
    step = make_train_step(model)

    import re

    lowered = jax.jit(step).lower(state, (x, y), rng)
    hbm_gb = None
    oom_msg = None
    try:
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        if ma is not None:
            total = (
                getattr(ma, "temp_size_in_bytes", 0)
                + getattr(ma, "argument_size_in_bytes", 0)
                + getattr(ma, "output_size_in_bytes", 0)
                - getattr(ma, "alias_size_in_bytes", 0)
            )
            hbm_gb = total / 1e9
    except Exception as e:  # noqa: BLE001 - the OOM *is* the evidence
        m = re.search(r"Used ([0-9.]+)G of ([0-9.]+)G hbm", str(e))
        if not m:
            raise
        hbm_gb = float(m.group(1))
        oom_msg = (f"XLA compile refused: needs {m.group(1)} GB HBM on a "
                   f"{m.group(2)} GB chip")

    # per-step H-sharded activation arithmetic: the dominant residuals are
    # the per-chunk scan carries + per-step (B, H, W, ch) tensors — all
    # proportional to local H rows, so /shards (+1 halo row in (H/shards+2))
    act_scale = (args.size / args.shards + 2) / args.size
    print(json.dumps({
        "geometry": f"{args.size}px b{args.batch} F{args.steps} "
                    f"chunk={args.remat_chunk} bf16",
        "single_chip_hbm_gb": round(hbm_gb, 2) if hbm_gb else None,
        "single_chip_compile": oom_msg or "compiled",
        "v5e_hbm_gb": 15.75,
        # None = memory analysis unavailable: report unknown, never "fits"
        "fits_single_chip": (hbm_gb <= 15.75) if hbm_gb else None,
        "spatial_shards": args.shards,
        "sharded_activation_fraction": round(act_scale, 4),
        "sharded_est_hbm_gb": round(hbm_gb * act_scale, 2) if hbm_gb else None,
    }, indent=2))


if __name__ == "__main__":
    main()
