"""Axial-attention kernel vs XLA einsum across head-width regimes.

VERDICT r1 #9: the Pallas kernel loses at MetNet's thin-head shapes
(d=8); this sweep measures where it wins so the auto-dispatch threshold is
evidence-based. Chained-iteration timing (tunnel-safe).

Usage: python tools/bench_axial.py
"""

import json
import time

import jax
import jax.numpy as jnp


def bench(fn, q, k, v, iters=20):
    @jax.jit
    def chained(q, k, v):
        def body(q, _):
            o = fn(q, k, v)
            return o.astype(q.dtype), ()

        q_fin, _ = jax.lax.scan(body, q, None, length=iters)
        return jnp.sum(q_fin.astype(jnp.float32))

    float(chained(q, k, v))  # compile
    t0 = time.perf_counter()
    float(chained(q, k, v))
    return (time.perf_counter() - t0) / iters * 1000  # ms


def main():
    from satflow_tpu.core.utils import setup_compilation_cache
    from satflow_tpu.ops.pallas import axial_attention as A

    setup_compilation_cache()
    rng = jax.random.PRNGKey(0)
    shapes = [
        # (N, L, d) — thin MetNet aggregator, mid, fat self-attention heads
        (98304, 64, 8),
        (16384, 64, 32),
        (4096, 64, 64),
        (2048, 128, 64),
        (1024, 64, 128),
        (2048, 256, 64),
    ]
    for n, L, d in shapes:
        ks = jax.random.split(rng, 3)
        q = jax.random.normal(ks[0], (n, L, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (n, L, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (n, L, d), jnp.bfloat16)
        xla_ms = bench(A._attention_ref, q, k, v)
        pallas_ms = bench(A._attention_pallas, q, k, v)
        rec = {"N": n, "L": L, "d": d, "xla_ms": round(xla_ms, 3),
               "pallas_ms": round(pallas_ms, 3),
               "speedup": round(xla_ms / pallas_ms, 3)}
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
