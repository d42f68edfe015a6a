"""Train-step ceiling study: where do the milliseconds go? (VERDICT r2 #2)

Decomposes the ConvLSTM train step (forward + backward + Adam) into a
measured ladder at a given geometry:

  fwd        jit of the loss value only (rollout + MSE)
  fwd+bwd    jax.value_and_grad, no optimizer update
  step       the full train step (tools/bench_train.py methodology)
  opt        apply_gradients alone on precomputed grads
  step[xla-gate-bwd]   SATFLOW_FUSED_BWD=0 — gate backward on XLA instead of
                        the fused Pallas kernel (the r2 uplift, re-measured)
  step[unmerged-conv-bwd] SATFLOW_MERGED_CONV_BWD=0 — the four separate
                        per-step conv VJPs (dx, dh, dWx, dWh); the merged
                        two-contraction formulation is the default, so this
                        is the ablation BASELINE for the documented +6.9%
  step[save-gates]      SATFLOW_SAVE_GATES=1 — the forward emits the
                        pre-activation gates; the gate backward becomes pure
                        elementwise (no gate-conv recompute)

All timings chain iterations through evolving state inside one jit and fetch
a single scalar (tunneled-TPU-safe; see bench.py).

Usage: python -m tools.exp_train_ceiling [--size 64 --batch 32] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def _bench(fn, state0, iters):
    import jax

    out, s = fn(state0)
    float(s)  # compile + warmup
    t0 = time.perf_counter()
    _, s = fn(out if out is not None else state0)
    float(s)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--channels", type=int, default=12)
    p.add_argument("--history", type=int, default=7)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--remat-chunk", type=int, default=0)
    p.add_argument("--skip", default="", help="comma list of rows to skip")
    args = p.parse_args()
    skip = set(args.skip.split(",")) if args.skip else set()

    import jax
    import jax.numpy as jnp

    from satflow_tpu.core.registry import create_model
    from satflow_tpu.core.utils import setup_compilation_cache
    import satflow_tpu.models  # noqa: F401
    from satflow_tpu.train.state import TrainState
    from satflow_tpu.train.steps import make_train_step

    setup_compilation_cache()

    def build():
        model = create_model(
            "encoderdecoderconvlstm", input_channels=args.channels,
            out_channels=args.channels, forecast_steps=args.steps,
            hidden_dim=args.hidden, cell_impl="fused",
            remat=True, remat_chunk=args.remat_chunk,
            dtype=jnp.bfloat16, lr=1e-3,
        )
        rng = jax.random.PRNGKey(0)
        x = jax.random.uniform(
            rng, (args.batch, args.history, args.size, args.size, args.channels),
            dtype=jnp.bfloat16)
        y = jax.random.uniform(
            rng, (args.batch, args.steps, args.size, args.size, args.channels),
            dtype=jnp.bfloat16)
        batch = (x, y)
        variables = model.init_variables(rng, batch)
        params, mstate = model.split_variables(variables)
        state = TrainState.create(params, mstate, model.make_optimizer())
        return model, state, batch, rng

    model, state, batch, rng = build()
    frames = args.batch * args.steps
    results = {}

    def chain(body, data):
        # the batch rides as a jit ARGUMENT: baking it in as a constant
        # inflates the serialized program past the tunnel compile-service
        # body limit at 256px (HTTP 413)
        @jax.jit
        def run(st, b):
            def f(carry, _):
                return body(carry, b)
            out, scal = jax.lax.scan(f, st, None, length=args.iters)
            return out, jnp.sum(scal.astype(jnp.float32))
        return lambda st: run(st, data)

    # -- fwd only ------------------------------------------------------------
    def loss_value(params, b):
        loss, _ = model.loss(params, state.model_state, b, rng, train=True)
        return loss

    if "fwd" not in skip:
        def fwd_body(p, b):
            loss = loss_value(p, b)
            # fold the loss back into the params so XLA cannot hoist the
            # loop-invariant forward out of the scan (measured: it does)
            new_p = jax.tree_util.tree_map(
                lambda a: a + (loss * 1e-30).astype(a.dtype), p)
            return new_p, loss
        run = chain(fwd_body, batch)
        results["fwd"] = _bench(lambda s: run(s), state.params, args.iters)

    # -- fwd + bwd (no optimizer) -------------------------------------------
    if "bwd" not in skip:
        def grad_body(params, b):
            loss, grads = jax.value_and_grad(loss_value)(params, b)
            # fold grads back so the scan has a real data dependence
            new_p = jax.tree_util.tree_map(lambda p_, g: p_ - 0.0 * g, params, grads)
            return new_p, loss
        run = chain(grad_body, batch)
        results["fwd+bwd"] = _bench(lambda s: run(s), state.params, args.iters)

    # -- full step -----------------------------------------------------------
    step = make_train_step(model)

    def step_body(st, b):
        st, m = step(st, b, rng)
        return st, m["loss"]

    if "step" not in skip:
        run = chain(step_body, batch)
        results["step"] = _bench(lambda s: run(s), state, args.iters)

    # -- optimizer only ------------------------------------------------------
    if "opt" not in skip:
        _, grads = jax.value_and_grad(loss_value)(state.params, batch)
        grads = jax.tree_util.tree_map(lambda g: jax.device_put(g), grads)

        def opt_body(st, g):
            st2 = st.apply_gradients(g)
            return st2, jax.tree_util.tree_leaves(st2.params)[0].sum()
        run = chain(opt_body, grads)
        results["opt"] = _bench(lambda s: run(s), state, args.iters)

    # -- ablations through env toggles (fresh jit each) ----------------------
    # NOTE: merged conv grads are the DEFAULT since r3, so the baseline
    # 'step' row IS merged; the ablation below turns them OFF to keep the
    # documented merged-vs-unmerged comparison reproducible.
    for name, env in (
        ("step[xla-gate-bwd]", {"SATFLOW_FUSED_BWD": "0"}),
        ("step[unmerged-conv-bwd]", {"SATFLOW_MERGED_CONV_BWD": "0"}),
        ("step[save-gates]", {"SATFLOW_SAVE_GATES": "1"}),
        ("step[save-gates+unmerged]",
         {"SATFLOW_SAVE_GATES": "1", "SATFLOW_MERGED_CONV_BWD": "0"}),
    ):
        if name in skip:
            continue
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            model2, state2, batch2, rng2 = build()
            step2 = make_train_step(model2)

            def body2(st, b):
                st, m = step2(st, b, rng2)
                return st, m["loss"]
            run = chain(body2, batch2)
            results[name] = _bench(lambda s: run(s), state2, args.iters)
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    rows = {
        k: {"ms": round(v * 1000, 2), "fps": round(frames / v, 1)}
        for k, v in results.items()
    }
    print(json.dumps({
        "geometry": f"{args.size}px b{args.batch} F{args.steps} "
                    f"chunk={args.remat_chunk}",
        **rows,
    }, indent=2))


if __name__ == "__main__":
    main()
