"""Model-zoo inference throughput on one chip (frames/s, bf16 where safe).

Beyond the flagship ConvLSTM (bench.py), this measures the other headline
families at reference-scale geometries so the perf story covers the zoo:

- MetNet   — 256px input, 64px MetNet crop geometry, 24 lead times batched
             in one pass (the TPU redesign of the per-step reference loop).
- Perceiver— 64px, 12ch sat + topo modalities, 24 steps together.
- DGMR     — generator sampling at 128px, 24 steps (the skillful-nowcasting
             config geometry: configs/model/nowcasting_gan.yaml).
- Unet     — 64px channels-stacked.

Usage: python -m tools.bench_zoo [--iters 5] [--only metnet,...]
Prints one JSON line per model.
"""

from __future__ import annotations

import argparse
import json
import time


def _bench(name, model, ds_kw, steps, iters, gan=False):
    import jax
    import jax.numpy as jnp

    from satflow_tpu.data.fake import FakeDataset

    key = jax.random.PRNGKey(0)
    ds = FakeDataset(length=1, **ds_kw)
    batch = ds[0]
    if gan:
        variables, _ = model.init_gan_variables(key, batch)

        def fwd(v, x, k):
            out, _ = model.generate(v, x, k, train=False)
            return out
    else:
        variables = model.init_variables(key, batch)

        def fwd(v, x, k):  # noqa: ARG001
            return model.forward(v, x)

    x, _ = model.prepare_batch(batch)
    x = jax.tree_util.tree_map(jnp.asarray, x)  # dict inputs (Perceiver) too

    @jax.jit
    def chained(v, x, k):
        # every iteration's input depends on the previous OUTPUT (a tanh'd
        # epsilon, not constant-foldable) so XLA cannot hoist the forward out
        # of the while loop and report one forward as `iters`
        def body(carry, _):
            key, eps = carry
            k2, s = jax.random.split(key)
            x_i = jax.tree_util.tree_map(
                lambda a: a + eps.astype(a.dtype), x
            )
            out = fwd(v, x_i, s)
            eps_next = jnp.tanh(jnp.sum(out.astype(jnp.float32))) * 1e-12
            return (k2, eps_next), eps_next
        (_, _), sums = jax.lax.scan(body, (k, jnp.float32(0.0)), None,
                                    length=iters)
        return jnp.sum(sums)

    float(chained(variables, x, key))  # compile
    t0 = time.perf_counter()
    float(chained(variables, x, key))
    dt = (time.perf_counter() - t0) / iters
    bsz = ds_kw.get("batch_size", 2)
    fps = bsz * steps / dt
    print(json.dumps({
        "model": name,
        "geometry": f"b{bsz} {ds_kw.get('width')}px F{steps}",
        "frames_per_sec": round(fps, 1),
        "step_ms": round(dt * 1000, 2),
    }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--only", default="")
    args = p.parse_args()
    only = set(filter(None, args.only.split(",")))

    import jax.numpy as jnp

    from satflow_tpu.core.registry import create_model
    from satflow_tpu.core.utils import setup_compilation_cache
    import satflow_tpu.models  # noqa: F401

    setup_compilation_cache()
    F = 24

    if not only or "metnet" in only:
        m = create_model(
            "litmetnet", input_channels=16, sat_channels=12, input_size=64,
            forecast_steps=F, hidden_dim=64, dtype=jnp.bfloat16,
        )
        _bench("litmetnet", m,
               dict(batch_size=8, width=256, height=256, number_sat_channels=12,
                    history_minutes=30, forecast_minutes=F * 5),
               F, args.iters)

    if not only or "perceiver" in only:
        m = create_model(
            "perceiver", forecast_steps=F, input_channels=12, sat_channels=12,
            input_size=64, depth=4, num_latents=256, latent_dim=256,
            predict_timesteps_together=True, dtype=jnp.bfloat16,
        )
        _bench("perceiver", m,
               dict(batch_size=8, width=64, height=64, number_sat_channels=12,
                    history_minutes=30, forecast_minutes=F * 5),
               F, args.iters)

    if not only or "dgmr" in only:
        m = create_model(
            "nowcastinggan", forecast_steps=F, input_channels=1,
            output_shape=128, context_channels=192, latent_channels=384,
            num_samples=1,
        )
        _bench("nowcastinggan", m,
               dict(batch_size=4, width=128, height=128, number_sat_channels=1,
                    history_minutes=15, forecast_minutes=F * 5),
               F, args.iters, gan=True)

    if not only or "unet" in only:
        m = create_model(
            "unet", forecast_steps=F, input_channels=12 * 7,
            channels_per_timestep=12,
        )
        _bench("unet", m,
               dict(batch_size=8, width=64, height=64, number_sat_channels=12,
                    history_minutes=30, forecast_minutes=F * 5),
               F, args.iters)


if __name__ == "__main__":
    main()
