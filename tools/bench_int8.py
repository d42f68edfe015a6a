"""int8 serving-rollout bench: the VMEM-raise shot at the 2x question.

docs/DESIGN.md records the int8 path's honest end-to-end result: 1.19x per
decoder cell vs bf16 despite a measured 1.93x dot-level MXU advantage — the
gap eaten by Mosaic's int8 4-way sublane relayouts on the strided window
reads. The r3 scoped-VMEM raise (SATFLOW_VMEM_LIMIT_BYTES, default 64 MiB)
that moved the bf16 headline 1353 -> 1404.9 f/s also applies to the int8
kernel since r4 (`fused_convlstm_step_int8` passes `_compiler_params()`),
which makes block_h 16/32 compilable at 256px where the f32 accumulator
previously exceeded the Mosaic-default 16 MiB — fewer grid steps, fatter
int8 matmuls, relayout cost amortized over more rows. This tool measures
whether that closes any of the 2x gap: the full 24-step 256px int8 rollout
(quantize -> encoder/decoder scans -> bf16 head) at block_h in {8, 16, 32}
against the bf16 flagship rollout at the same geometry.

Usage (TPU): python tools/bench_int8.py [--batch 48] [--size 256]
Prints one JSON line per arm; paste the table into docs/DESIGN.md's int8
section.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--history", type=int, default=7)
    p.add_argument("--channels", type=int, default=12)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--unroll", type=int, default=8)
    p.add_argument("--block-h", default="8,16,32",
                   help="comma list of int8 block_h values to sweep")
    p.add_argument("--iters", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import satflow_tpu.ops.pallas.fused_convlstm_int8 as i8
    from satflow_tpu.core.utils import setup_compilation_cache
    from satflow_tpu.models.conv_lstm import ConvLSTMCore

    setup_compilation_cache()
    b, t, s, c = args.batch, args.history, args.size, args.channels
    x = jnp.asarray(np.random.default_rng(0).random((b, t, s, s, c)),
                    jnp.bfloat16)

    core = ConvLSTMCore(hidden_dim=args.hidden, out_channels=c,
                        forecast_steps=args.steps, cell_impl="fused",
                        unroll=args.unroll, remat=False, dtype=jnp.bfloat16)
    variables = core.init(jax.random.PRNGKey(0), x[:1])
    params = variables["params"]

    # Chained-scan timing (the bench.py headline methodology): each
    # iteration's input is the previous iteration's OUTPUT frames, so XLA
    # cannot hoist the rollout out of the loop, and exactly one scalar
    # crosses the tunnel (block_until_ready on this tunneled backend returns
    # at dispatch time). The carry must be the output slice itself — an
    # earlier x+eps variant forced a full f32 relayout copy of x inside the
    # loop (C=12 padded to 128 lanes, 10.7x expansion -> 22.8 GB HBM OOM at
    # this geometry) and produced garbage timings where it did run.
    iters = args.iters

    def timed(apply_fn, p, x0):
        @jax.jit
        def chained(p, x0):
            def body(xc, _):
                out = apply_fn(p, xc)
                return out[:, :t].astype(xc.dtype), None
            xf, _ = jax.lax.scan(body, x0, None, length=iters)
            return jnp.sum(xf.astype(jnp.float32))

        float(chained(p, x0))  # compile
        t0 = time.perf_counter()
        float(chained(p, x0))
        return (time.perf_counter() - t0) / iters

    # bf16 reference rollout (the bench.py forward path)
    dt = timed(lambda v, xx: core.apply(v, xx), variables, x)
    bf16_fps = b * args.steps / dt
    print(json.dumps({"metric": f"bf16 rollout {s}px b{b} F{args.steps}",
                      "value": round(bf16_fps, 1), "unit": "frames/s"}),
          flush=True)

    qparams = i8.quantize_convlstm_params(params)
    for bh in [int(v) for v in args.block_h.split(",")]:
        i8._BLOCK_H = bh  # module default consumed per-call by the kernel
        jax.clear_caches()  # block_h is baked into the traced kernel
        try:
            dt = timed(
                lambda qp, xx: i8.int8_rollout(qp, xx, args.steps,
                                               unroll=args.unroll),
                qparams, x,
            )
        except Exception as e:  # noqa: BLE001 - report the failing config
            print(json.dumps({"metric": f"int8 rollout bh={bh}",
                              "error": str(e)[:200]}), flush=True)
            continue
        fps = b * args.steps / dt
        print(json.dumps({
            "metric": f"int8 rollout {s}px b{b} F{args.steps} bh={bh}",
            "value": round(fps, 1), "unit": "frames/s",
            "vs_bf16": round(fps / bf16_fps, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
