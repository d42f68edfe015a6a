"""Benchmark: frames/sec/chip for the 24-step 256×256×12ch ConvLSTM rollout.

The BASELINE.json north-star metric: a 24-step autoregressive nowcast rollout at
256×256 with 12 input channels (EUMETSAT MSG geometry) on one TPU chip, bf16
compute. The model is the flagship scan-fused EncoderDecoderConvLSTM
(satflow_tpu/models/conv_lstm.py) with hidden_dim=64 — the same architecture as
reference satflow/models/conv_lstm.py, whose per-timestep Python-loop rollout on
an A100 (PyTorch eager, AMP) is estimated at ~200 frames/s/chip for this shape
(analytic: ~95 GFLOP per output frame, eager per-step launches + per-frame host
syncs). The driver target is 5× that, so vs_baseline = fps / (5 × 200).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

A100_REFERENCE_FPS = 200.0  # estimated reference impl throughput (see docstring)
TARGET_MULTIPLIER = 5.0

HISTORY_STEPS = 7  # 30 min history + now
FORECAST_STEPS = 24
SIZE = 256
CHANNELS = 12
# v5e optimum, retuned r2: with the fused+padded-IO cell, batch scales past 16
# (b16: 1016, b24: 1089, b32: 1119, b48: 1131 at u8; u24: b32 1160, b40 1163,
# b48 1171; b64 OOMs HBM). Padded-IO on top: b48/u24 1339, b56/u24 1357 f/s.
BATCH = int(os.environ.get("BENCH_BATCH", "56"))
UNROLL = int(os.environ.get("BENCH_UNROLL", "24"))
HIDDEN = 64
# "cmajor": channel-major flat-lane decoder (ops/pallas/cmajor_convlstm.py) —
# the r5 layout lever, measured 1.225x over the NHWC fused step at the
# ceiling-study shape; "fused": the NHWC padded-IO Pallas cell everywhere.
CELL_IMPL = os.environ.get("BENCH_CELL_IMPL", "fused")


def main():
    from satflow_tpu.core.utils import setup_compilation_cache
    from satflow_tpu.models.conv_lstm import ConvLSTMCore

    setup_compilation_cache()

    model = ConvLSTMCore(
        hidden_dim=HIDDEN,
        out_channels=CHANNELS,
        forecast_steps=FORECAST_STEPS,
        cell_impl=CELL_IMPL,
        unroll=UNROLL,  # measured: 560 (u1) -> 613 (u4) -> 656 f/s (u8) on v5e
        head_in_scan=os.environ.get("BENCH_HEAD_IN_SCAN", "1") == "1",
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(
        rng, (BATCH, HISTORY_STEPS, SIZE, SIZE, CHANNELS), dtype=jnp.bfloat16
    )
    variables = jax.jit(model.init)(rng, x)

    n_iters = 10

    # Chain iterations with a data dependence (output frames feed the next
    # input) and fetch one scalar at the end: robust timing even on remote /
    # tunneled backends where block_until_ready is not a reliable barrier.
    @jax.jit
    def chained(variables, x):
        def body(x, _):
            out = model.apply(variables, x)
            return out[:, :HISTORY_STEPS].astype(x.dtype), ()

        x_final, _ = jax.lax.scan(body, x, None, length=n_iters)
        return jnp.sum(x_final.astype(jnp.float32))

    float(chained(variables, x))  # warmup / compile
    t0 = time.perf_counter()
    float(chained(variables, x))
    dt = (time.perf_counter() - t0) / n_iters

    frames_per_sec = BATCH * FORECAST_STEPS / dt
    result = {
        "metric": "frames/sec/chip, 24-step 256x256x12ch ConvLSTM rollout (bf16)",
        "value": round(frames_per_sec, 2),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / (TARGET_MULTIPLIER * A100_REFERENCE_FPS), 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
