"""Training-step throughput bench for the flagship ConvLSTM (DESIGN.md ladder).

Measures frames/s/chip of the FULL train step (forward + backward + Adam) at
the reference's 64px training shape and optionally at the 256px production
shape with remat. Iterations are chained through the evolving TrainState (real
data dependence), one scalar fetched at the end — the timing methodology that
survives the tunneled-TPU backend.

Usage: python tools/bench_train.py [--size 64] [--batch 32] [--steps 24]
       [--remat/--no-remat] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--channels", type=int, default=12)
    p.add_argument("--history", type=int, default=7)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--remat", action="store_true", default=False)
    p.add_argument("--remat-chunk", type=int, default=0)
    p.add_argument("--cell", default="fused")
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
        "encoderdecoderconvlstm",
        input_channels=args.channels,
        out_channels=args.channels,
        forecast_steps=args.steps,
        hidden_dim=args.hidden,
        cell_impl=args.cell,
        remat=args.remat,
        remat_chunk=args.remat_chunk,
        unroll=1,
        dtype=jnp.bfloat16,
        lr=1e-3,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(
        rng, (args.batch, args.history, args.size, args.size, args.channels),
        dtype=jnp.bfloat16,
    )
    y = jax.random.uniform(
        rng, (args.batch, args.steps, args.size, args.size, args.channels),
        dtype=jnp.bfloat16,
    )
    batch = (x, y)
    variables = model.init_variables(rng, batch)
    params, model_state = model.split_variables(variables)
    state = TrainState.create(params, model_state, model.make_optimizer())
    step = make_train_step(model)

    # one warmup step (compile)
    t0 = time.perf_counter()
    state, metrics = step(state, batch, rng)
    loss0 = float(jax.device_get(metrics["loss"]))
    compile_s = time.perf_counter() - t0

    @jax.jit
    def chained(state, batch, rng):
        def body(carry, _):
            st, key = carry
            key, sub = jax.random.split(key)
            st, m = step(st, batch, sub)  # traced inline under the outer jit
            return (st, key), m["loss"]

        (state, _), losses = jax.lax.scan(body, (state, rng), None,
                                          length=args.iters)
        return state, jnp.sum(losses.astype(jnp.float32))

    state2, s = chained(state, batch, rng)
    float(s)  # warmup/compile of the chained program
    t0 = time.perf_counter()
    _, s = chained(state2, batch, rng)
    float(s)
    dt = (time.perf_counter() - t0) / args.iters

    fps = args.batch * args.steps / dt
    print(json.dumps({
        "metric": f"train frames/s/chip {args.size}px b{args.batch} "
                  f"F{args.steps} {args.cell} remat={args.remat}"
                  + (f" chunk={args.remat_chunk}" if args.remat_chunk else ""),
        "value": round(fps, 2),
        "unit": "frames/s",
        "step_ms": round(dt * 1000, 2),
        "compile_s": round(compile_s, 1),
        "loss0": loss0,
    }))


if __name__ == "__main__":
    main()
