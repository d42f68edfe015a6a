"""Serving-path bench on the real chip: latency + micro-batched throughput.

Measures the flagship ConvLSTM nowcast (24-step 256x256x12ch bf16 rollout,
the BASELINE.json geometry) through satflow_tpu.serve:

- single-request latency through a compiled InferenceSession (b1..max_batch);
- sustained throughput with N concurrent clients through the MicroBatcher
  (the serving configuration: requests coalesce into one forward).

Usage: python -m tools.bench_serve [--max-batch 8] [--clients 16] [--size 256]
"""

from __future__ import annotations

import argparse
import json
import threading
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--history", type=int, default=7)
    p.add_argument("--channels", type=int, default=12)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests", type=int, default=48)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from satflow_tpu.core.registry import create_model
    from satflow_tpu.core.utils import setup_compilation_cache
    import satflow_tpu.models  # noqa: F401
    from satflow_tpu.serve import InferenceSession, MicroBatcher

    setup_compilation_cache()

    model = create_model(
        "encoderdecoderconvlstm", input_channels=args.channels,
        out_channels=args.channels, forecast_steps=args.steps,
        hidden_dim=args.hidden, cell_impl="fused", unroll=8, remat=False,
        dtype=jnp.bfloat16,
    )
    x1 = np.zeros((1, args.history, args.size, args.size, args.channels),
                  np.float32)
    variables = jax.jit(model.module.init)(jax.random.PRNGKey(0),
                                           jnp.asarray(x1))
    session = InferenceSession(model, max_batch=args.max_batch,
                               variables=variables, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    sample = rng.random(x1.shape[1:], dtype=np.float32)

    # -- latency: sequential single requests (padded to max_batch) -----------
    session.predict(sample)  # compile
    lats = []
    for _ in range(10):
        t0 = time.perf_counter()
        session.predict(sample)
        lats.append(time.perf_counter() - t0)
    lats.sort()
    p50 = lats[len(lats) // 2] * 1000

    # -- throughput: concurrent clients through the micro-batcher ------------
    mb = MicroBatcher(session, window_ms=10.0)
    done = threading.Semaphore(0)

    def client(n_requests):
        for _ in range(n_requests):
            mb.submit(sample, timeout=300.0)
        done.release()

    per_client = max(1, args.requests // args.clients)
    t0 = time.perf_counter()
    threads = [
        threading.Thread(target=client, args=(per_client,), daemon=True)
        for _ in range(args.clients)
    ]
    for t in threads:
        t.start()
    for _ in threads:
        done.acquire()
    dt = time.perf_counter() - t0
    total = per_client * args.clients
    frames = total * args.steps
    mb.close()

    print(json.dumps({
        "metric": f"serving {args.size}px F{args.steps} max_batch={args.max_batch}",
        "p50_single_request_ms": round(p50, 1),
        "concurrent_clients": args.clients,
        "requests": total,
        "requests_per_sec": round(total / dt, 2),
        "frames_per_sec": round(frames / dt, 1),
        "forwards_issued": mb.batches_run,
        "coalescing": round(total / max(mb.batches_run, 1), 2),
    }))


if __name__ == "__main__":
    main()
