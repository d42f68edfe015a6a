"""Beyond-single-chip-HBM evidence for spatial (H-axis) parallelism.

Two modes:

- ``--mode single`` (run on the TPU backend): AOT-compiles the SINGLE-chip
  ConvLSTM train step at a full-disk-scale geometry and prints XLA's memory
  analysis (no execution) — demonstrating the geometry exceeds one v5e's
  16 GB HBM.
- ``--mode sharded`` (run with JAX_PLATFORMS=cpu
  XLA_FLAGS=--xla_force_host_platform_device_count=8): AOT-compiles the
  H-SHARDED spatial train step (`trainer.spatial=1x8` layout: batch over
  `data`, H over `model` — the post-r3 loader placement, so NO SPMD
  replicate-then-reshard is in the program) over the 8-device mesh and
  prints ``compiled.memory_analysis()`` — the COMPILER's per-device bytes,
  including temp buffers, halo copies, and the scan's saved activations,
  replacing the r3 (H/8+2)/H activation arithmetic with a measured number.

Usage: python -m tools.exp_spatial_memory [--size 1024 --batch 2 --steps 12]
       [--mode single|sharded]
"""

from __future__ import annotations

import argparse
import json
import os


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
    p.add_argument("--data-shards", type=int, default=1)
    p.add_argument("--mode", choices=["single", "sharded"], default="single")
    args = p.parse_args()

    import jax

    # The image's sitecustomize imports jax and registers the TPU backend
    # before this script runs, so the JAX_PLATFORMS env var alone is too
    # late — override the already-imported config too (same as conftest.py).
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from satflow_tpu.core.registry import create_model
    from satflow_tpu.core.utils import setup_compilation_cache
    import satflow_tpu.models  # noqa: F401
    from satflow_tpu.train.state import TrainState
    from satflow_tpu.train.steps import make_train_step

    setup_compilation_cache()
    if args.mode == "sharded":
        return sharded_aot(args)
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


def sharded_aot(args):
    """AOT-compile the H-sharded spatial train step on a DxM mesh and print
    the compiler's per-device memory analysis (VERDICT r4 task 2: replace
    the (H/8+2)/H arithmetic with `compiled.memory_analysis()` output).

    The memory PROGRAM is backend-independent enough for this purpose: buffer
    assignment sizes come from the sharded HLO's static shapes. (The CPU
    executable runs the fused step's exact XLA fallback; on TPU the Pallas
    kernel variant holds its working set in scoped VMEM, not extra HBM.)
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from satflow_tpu.core.registry import create_model
    import satflow_tpu.models  # noqa: F401
    from satflow_tpu.parallel.mesh import make_mesh
    from satflow_tpu.train.state import TrainState
    from satflow_tpu.train.steps import make_train_step

    n_dev = args.data_shards * args.shards
    if len(jax.devices()) < n_dev:
        raise SystemExit(
            f"--mode sharded needs {n_dev} devices, found {len(jax.devices())}"
            " — run with JAX_PLATFORMS=cpu "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_dev}"
        )
    mesh = make_mesh(axis_shapes=[args.data_shards, args.shards],
                     devices=jax.devices()[:n_dev])
    model = create_model(
        "encoderdecoderconvlstm", input_channels=args.channels,
        out_channels=args.channels, forecast_steps=args.steps,
        hidden_dim=args.hidden, cell_impl="fused",
        dtype=jnp.bfloat16, lr=1e-3,
    )
    model.enable_spatial(mesh, axis="model")
    rng = jax.random.PRNGKey(0)
    # init at a tiny geometry (params are geometry-independent), then lower
    # the step abstractly at the big one with the loader's spatial placement
    xs = jnp.zeros((1, args.history, 64, 64, args.channels), jnp.bfloat16)
    ys = jnp.zeros((1, args.steps, 64, 64, args.channels), jnp.bfloat16)
    variables = model.init_variables(rng, (xs, ys))
    params, mstate = model.split_variables(variables)
    params = jax.device_put(params, NamedSharding(mesh, P()))
    state = TrainState.create(params, mstate, model.make_optimizer())

    bspec = NamedSharding(mesh, P("data", None, "model"))
    x = jax.ShapeDtypeStruct(
        (args.batch, args.history, args.size, args.size, args.channels),
        jnp.bfloat16, sharding=bspec)
    y = jax.ShapeDtypeStruct(
        (args.batch, args.steps, args.size, args.size, args.channels),
        jnp.bfloat16, sharding=bspec)
    step = make_train_step(model)
    compiled = jax.jit(step).lower(state, (x, y), rng).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        raise SystemExit("memory_analysis() unavailable on this backend")
    per_dev = (
        ma.temp_size_in_bytes + ma.argument_size_in_bytes
        + ma.output_size_in_bytes - ma.alias_size_in_bytes
    )
    print(json.dumps({
        "geometry": f"{args.size}px b{args.batch} F{args.steps} bf16 "
                    f"spatial={args.data_shards}x{args.shards}",
        "mesh": f"data={args.data_shards} model={args.shards}",
        "per_device_temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
        "per_device_args_gb": round(ma.argument_size_in_bytes / 1e9, 3),
        "per_device_out_gb": round(ma.output_size_in_bytes / 1e9, 3),
        "per_device_alias_gb": round(ma.alias_size_in_bytes / 1e9, 3),
        "per_device_total_gb": round(per_dev / 1e9, 3),
        "v5e_hbm_gb": 15.75,
        "fits_per_chip": per_dev / 1e9 <= 15.75,
        "source": "compiled.memory_analysis() on the sharded SPMD executable",
    }, indent=2))


if __name__ == "__main__":
    main()
