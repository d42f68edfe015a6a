"""Training-step throughput bench for the flagship ConvLSTM (DESIGN.md ladder).

Measures frames/s/chip of the FULL train step (forward + backward + Adam) at
the reference's 64px training shape and optionally at the 256px production
shape with remat. Iterations are chained through the evolving TrainState (real
data dependence), one scalar fetched at the end — the timing methodology that
survives the tunneled-TPU backend.

Usage: python tools/bench_train.py [--size 64] [--batch 32] [--steps 24]
       [--remat/--no-remat] [--iters 8]

``--model metnet|perceiver|dgmr`` instead measures the OTHER driver-named
families' full train step at the zoo bench's reference-scale geometries
(tools/bench_zoo.py measures forward-only; this is the training analog —
VERDICT r3 #6): MetNet 256px in / 64px-crop out, Perceiver 64px F24, DGMR
128px F24 with its 2:1 discriminator:generator update ratio.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=None,
                   help="default 32 (ConvLSTM), or the zoo-bench geometry "
                        "for --model (metnet/perceiver 8, dgmr 4)")
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--channels", type=int, default=12)
    p.add_argument("--history", type=int, default=7)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--remat", action="store_true", default=False)
    p.add_argument("--remat-chunk", type=int, default=0)
    p.add_argument("--cell", default="fused")
    p.add_argument("--from-store", default=None, metavar="DIR",
                   help="drive the train step from an on-disk .sfb store "
                        "through Prefetcher + native ingest (VERDICT r2 #8); "
                        "writes the store first if DIR is empty/missing")
    p.add_argument("--pipeline-only", action="store_true",
                   help="with --from-store: measure the host-side store→"
                        "decode→split→batch rate without touching the device")
    p.add_argument("--store-batches", type=int, default=12)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--model", default=None,
                   choices=("metnet", "perceiver", "dgmr"),
                   help="bench another family's TRAIN step at its "
                        "reference-scale geometry instead of the ConvLSTM")
    p.add_argument("--gan-step", default="fused", choices=("fused", "split"),
                   help="GAN step mode (--model dgmr): 'fused' compiles one "
                        "XLA program per adversarial round (chained-scan "
                        "methodology); 'split' compiles separate D/G jits "
                        "(reference cloudgan.py:244-248's two optimizer "
                        "closures) and times an eager state-chained loop — "
                        "the mode that keeps DGMR-at-128px compile bounded")
    args = p.parse_args()

    if args.model:
        if args.batch is None:
            args.batch = {"metnet": 8, "perceiver": 8, "dgmr": 4}[args.model]
        return bench_model(args)
    if args.batch is None:
        args.batch = 32
    if args.from_store:
        return bench_from_store(args)

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


def bench_model(args):
    """Full-train-step throughput for the non-ConvLSTM driver families.

    Same methodology as the flagship bench: iterations chained through the
    evolving (GAN)TrainState under one jitted lax.scan so XLA cannot hoist
    the step, one scalar fetched at the end. Geometries match the
    forward-only zoo bench (tools/bench_zoo.py) so the two tables in
    docs/DESIGN.md are directly comparable.
    """
    import jax
    import jax.numpy as jnp

    from satflow_tpu.core.registry import create_model
    from satflow_tpu.core.utils import setup_compilation_cache
    from satflow_tpu.data.fake import FakeDataset
    import satflow_tpu.models  # noqa: F401
    from satflow_tpu.train.state import GANTrainState, TrainState
    from satflow_tpu.train.steps import make_gan_train_step, make_train_step

    setup_compilation_cache()
    F = args.steps

    if args.model == "metnet":
        model = create_model(
            "litmetnet", input_channels=16, sat_channels=12, input_size=64,
            forecast_steps=F, hidden_dim=64, dtype=jnp.bfloat16, lr=1e-3,
        )
        ds_kw = dict(batch_size=args.batch, width=256, height=256,
                     number_sat_channels=12, history_minutes=30,
                     forecast_minutes=F * 5)
        label = f"metnet 256px->64crop b{ds_kw['batch_size']} F{F}"
    elif args.model == "perceiver":
        model = create_model(
            "perceiver", forecast_steps=F, input_channels=12, sat_channels=12,
            input_size=64, depth=4, num_latents=256, latent_dim=256,
            predict_timesteps_together=True, dtype=jnp.bfloat16, lr=1e-3,
        )
        ds_kw = dict(batch_size=args.batch, width=64, height=64,
                     number_sat_channels=12, history_minutes=30,
                     forecast_minutes=F * 5)
        label = f"perceiver 64px b{ds_kw['batch_size']} F{F}"
    else:  # dgmr
        model = create_model(
            "nowcastinggan", forecast_steps=F, input_channels=1,
            output_shape=128, context_channels=192, latent_channels=384,
            num_samples=1, disc_steps=2,
        )
        ds_kw = dict(batch_size=args.batch, width=128, height=128,
                     number_sat_channels=1, history_minutes=15,
                     forecast_minutes=F * 5)
        label = f"dgmr 128px b{ds_kw['batch_size']} F{F} disc2:1"

    ds = FakeDataset(length=1, **ds_kw)
    batch = jax.tree_util.tree_map(jnp.asarray, ds[0])
    rng = jax.random.PRNGKey(0)

    if model.is_gan:
        g_vars, d_vars = model.init_gan_variables(rng, batch)
        g_params, g_state = model.split_variables(g_vars)
        d_params, d_state = model.split_variables(d_vars)
        g_tx, d_tx = model.make_optimizers()
        state = GANTrainState.create(g_params, d_params,
                                     {"g": g_state, "d": d_state}, g_tx, d_tx)
        step = make_gan_train_step(model, mode=args.gan_step)
        loss_key = "g_loss"
        if args.gan_step == "split":
            label += " split-D/G"
            return _bench_split_gan(args, step, state, batch, F,
                                    ds_kw["batch_size"], label, loss_key)
    else:
        variables = model.init_variables(rng, batch)
        params, model_state = model.split_variables(variables)
        state = TrainState.create(params, model_state, model.make_optimizer())
        step = make_train_step(model)
        loss_key = "loss"

    t0 = time.perf_counter()
    state, metrics = step(state, batch, rng)
    loss0 = float(jax.device_get(metrics[loss_key]))
    compile_s = time.perf_counter() - t0

    @jax.jit
    def chained(state, batch, rng):
        def body(carry, _):
            st, key = carry
            key, sub = jax.random.split(key)
            st, m = step(st, batch, sub)
            return (st, key), m[loss_key]

        (state, _), losses = jax.lax.scan(body, (state, rng), None,
                                          length=args.iters)
        return state, jnp.sum(losses.astype(jnp.float32))

    state2, s = chained(state, batch, rng)
    float(s)  # compile the chained program
    t0 = time.perf_counter()
    _, s = chained(state2, batch, rng)
    float(s)
    dt = (time.perf_counter() - t0) / args.iters

    fps = ds_kw["batch_size"] * F / dt
    print(json.dumps({
        "metric": f"train frames/s/chip {label}",
        "value": round(fps, 2),
        "unit": "frames/s",
        "step_ms": round(dt * 1000, 2),
        "compile_s": round(compile_s, 1),
        "loss0": loss0,
    }))


def _bench_split_gan(args, step, state, batch, F, batch_size, label, loss_key):
    """Eager-loop timing for the split D/G GAN step.

    The chained-scan methodology would re-inline both jits into one scan body
    (jit-of-jit inlines under tracing), recreating exactly the fat program the
    split exists to avoid. Instead: an eager loop chained through the evolving
    donated GANTrainState (real data dependence — XLA cannot overlap rounds),
    one scalar fetched at the end. Valid here because a DGMR adversarial round
    is hundreds of ms — dispatch overhead is noise at this geometry.
    """
    import jax

    rng = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    state, metrics = step(state, batch, rng)
    loss0 = float(jax.device_get(metrics[loss_key]))
    compile_s = time.perf_counter() - t0

    # warm loop (both halves now compiled; settle allocator)
    rng, sub = jax.random.split(rng)
    state, metrics = step(state, batch, sub)
    jax.block_until_ready(metrics[loss_key])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
    jax.block_until_ready(metrics[loss_key])
    dt = (time.perf_counter() - t0) / args.iters

    fps = batch_size * F / dt
    print(json.dumps({
        "metric": f"train frames/s/chip {label}",
        "value": round(fps, 2),
        "unit": "frames/s",
        "step_ms": round(dt * 1000, 2),
        "compile_s": round(compile_s, 1),
        "loss0": loss0,
    }))


def bench_from_store(args):
    """Measure the input pipeline feeding the chip (VERDICT r2 #8).

    Two modes:
    - ``--pipeline-only``: host-side rate of store → native-ingest decode →
      past/future split → batch dicts (no device involved). This is the
      number to compare against the chip's compute f/s: the pipeline
      sustains training iff pipeline f/s >= chip f/s.
    - default: the FULL loop — the same loader device_puts each batch and the
      train step consumes it. NOTE: on the dev host the TPU link is a
      ~13-26 MB/s tunnel, so this number is transfer-bound there (documented
      in docs/DESIGN.md); on a real TPU host the DMA path is >10 GB/s and
      the pipeline-only number is the binding one.
    """
    import os
    import time

    import numpy as np

    from satflow_tpu.data.convert import convert
    from satflow_tpu.data.datamodule import SatFlowDataModule
    from satflow_tpu.data.datasets import write_fake_store

    seq = args.history + args.steps
    store = os.path.join(args.from_store, "train")

    def _store_matches() -> bool:
        """Reuse the store only when its geometry matches the flags — a
        stale store of another batch/size would be silently benchmarked
        under the wrong label (and frames/s computed from the wrong batch)."""
        if not os.path.isdir(store):
            return False
        try:
            from satflow_tpu.data.datasets import SfbBatchStore

            s = SfbBatchStore(store)
            if len(s) < 1:
                return False
            sat = s.read(0)["sat_data"]
            return sat.shape == (args.batch, seq, args.size, args.size,
                                 args.channels)
        except Exception:  # noqa: BLE001 - unreadable == rebuild
            return False

    if not _store_matches():
        import shutil

        shutil.rmtree(store, ignore_errors=True)
        npz = os.path.join(args.from_store, "_npz")
        shutil.rmtree(npz, ignore_errors=True)
        write_fake_store(npz, n_batches=args.store_batches,
                         batch_size=args.batch, size=args.size,
                         seq_length=seq, sat_channels=args.channels)
        convert(npz, store, verbose=False)
        print(f"# wrote {args.store_batches} sfb batches to {store}")

    dm = SatFlowDataModule(
        data_path=args.from_store, num_workers=args.workers,
        prefetch_factor=4, shard=not args.pipeline_only,
        history_minutes=(args.history - 1) * 5, forecast_minutes=args.steps * 5,
    )

    if args.pipeline_only:
        import json as _json

        # one pass to warm caches/threads, then timed passes
        frames = 0
        for _ in dm.train_dataloader():
            pass
        t0 = time.perf_counter()
        passes = 3
        for _ in range(passes):
            for x, y in dm.train_dataloader():
                frames += x["sat_data"].shape[0] * args.steps
        dt = time.perf_counter() - t0
        mb = frames / args.steps * seq * args.size * args.size * args.channels * 4 / 1e6
        print(_json.dumps({
            "metric": f"input pipeline frames/s {args.size}px b{args.batch} "
                      f"({args.workers} workers, native ingest)",
            "value": round(frames / dt, 2),
            "unit": "frames/s",
            "mb_per_s": round(mb / dt, 1),
        }))
        return

    import json as _json

    import jax

    from satflow_tpu.core.registry import create_model
    from satflow_tpu.core.utils import setup_compilation_cache
    import satflow_tpu.models  # noqa: F401
    from satflow_tpu.train.state import TrainState
    from satflow_tpu.train.steps import make_train_step
    import jax.numpy as jnp

    setup_compilation_cache()
    model = create_model(
        "encoderdecoderconvlstm", input_channels=args.channels,
        out_channels=args.channels, forecast_steps=args.steps,
        hidden_dim=args.hidden, cell_impl=args.cell, remat=args.remat,
        remat_chunk=args.remat_chunk, dtype=jnp.bfloat16, lr=1e-3,
    )
    rng = jax.random.PRNGKey(0)
    loader = dm.train_dataloader()
    first = next(iter(loader))
    variables = model.init_variables(rng, first)
    params, model_state = model.split_variables(variables)
    state = TrainState.create(params, model_state, model.make_optimizer())
    step = make_train_step(model)
    state, m = step(state, first, rng)  # compile
    float(jax.device_get(m["loss"]))

    frames = 0
    t0 = None
    for ep in range(3):
        for i, batch in enumerate(loader if ep == 0 else dm.train_dataloader()):
            rng, sub = jax.random.split(rng)
            state, m = step(state, batch, sub)
            if t0 is None:
                t0 = time.perf_counter()  # start after the first (warm) batch
            else:
                # count from the ACTUAL batch, not the flag (a store batch
                # is authoritative for what the chip processed)
                frames += batch[0]["sat_data"].shape[0] * args.steps
    float(jax.device_get(m["loss"]))
    dt = time.perf_counter() - t0
    print(_json.dumps({
        "metric": f"store-fed train frames/s {args.size}px b{args.batch} "
                  f"F{args.steps} ({args.workers} workers)",
        "value": round(frames / dt, 2),
        "unit": "frames/s",
        "note": "tunnel-transfer-bound on the dev host; see DESIGN.md",
    }))


if __name__ == "__main__":
    main()
