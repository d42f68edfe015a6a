"""Does raising Mosaic's scoped-VMEM limit unlock bigger row blocks at 256px?

The r2 ceiling study (tools/exp_tap9.py, docs/DESIGN.md) treated the default
16 MB scoped-VMEM limit as fixed: block_h=16 at W=256/64ch "exceeds scoped
VMEM", so production runs bh=8 and the budget invariant in _pick_block_h is
calibrated to that. But the limit is an XLA flag
(--xla_tpu_scoped_vmem_limit_kib), and a v5e core has 128 MiB of physical
VMEM — the default leaves most of it on the table. Bigger blocks mean fewer
grid steps, fatter (rows x K) matmuls, and a smaller halo-overfetch fraction.

This tool times the padded fused step at the production decoder shape
(B=56, 256px, Cx=Ch=64, bf16) for block_h in {8, 16, 32} under a raised
limit, and then the FULL bench rollout for the winner.

Run on TPU:
    python -m tools.exp_vmem_block [--vmem-kib 65536] [--rollout]

The limit is applied via the per-kernel Mosaic knob
(pltpu.CompilerParams.vmem_limit_bytes), driven by SATFLOW_VMEM_LIMIT_BYTES,
which this tool sets before jax import — the global
--xla_tpu_scoped_vmem_limit_kib XLA flag is not recognized by this client
build. Run one configuration per process. Results recorded in
docs/DESIGN.md.
"""

import argparse
import os
import sys
import time


def _parse():
    p = argparse.ArgumentParser()
    p.add_argument("--vmem-kib", type=int, default=0,
                   help="scoped VMEM limit in KiB (0 = leave default)")
    p.add_argument("--block-h", type=int, nargs="*", default=[8, 16, 32])
    p.add_argument("--rollout", action="store_true",
                   help="also time the full bench rollout (model path; uses "
                        "SATFLOW_BLOCK_H to override the picker)")
    p.add_argument("--iters", type=int, default=30)
    return p.parse_args()


def main():
    args = _parse()
    if args.vmem_kib:
        # per-kernel Mosaic knob (pltpu.CompilerParams.vmem_limit_bytes) —
        # the global --xla_tpu_scoped_vmem_limit_kib XLA flag is not
        # recognized by this client build
        os.environ["SATFLOW_VMEM_LIMIT_BYTES"] = str(args.vmem_kib * 1024)

    import jax
    import jax.numpy as jnp
    from satflow_tpu.ops.pallas.fused_convlstm_step import _step_pallas_padded

    if jax.devices()[0].platform != "tpu":
        print("not on TPU; this experiment needs hardware", file=sys.stderr)
        return 1

    B, HW, CX, CH = 56, 256, 64, 64
    rng = jax.random.PRNGKey(0)
    k = iter(jax.random.split(rng, 10))
    xp = jax.random.uniform(next(k), (B, HW, HW + 2, CX), dtype=jnp.bfloat16)
    hp = jax.random.uniform(next(k), (B, HW, HW + 2, CH), dtype=jnp.bfloat16)
    c = jax.random.uniform(next(k), (B, HW, HW, CH), dtype=jnp.bfloat16)
    wx = (jax.random.normal(next(k), (3, 3, CX, 4 * CH)) * 0.05).astype(jnp.bfloat16)
    wh = (jax.random.normal(next(k), (3, 3, CH, 4 * CH)) * 0.05).astype(jnp.bfloat16)
    b = (jax.random.normal(next(k), (4 * CH,)) * 0.05).astype(jnp.bfloat16)

    n = args.iters
    print(f"vmem_kib={args.vmem_kib or 'default'}  shape B={B} {HW}px "
          f"Cx={CX} Ch={CH} bf16  iters={n}")

    for bh in args.block_h:
        # chain steps through h/c so nothing is dead-code-eliminated; one
        # scalar fetch at the end (reliable on tunneled backends)
        def chained(xp, hp, c, _bh=bh):
            def body(carry, _):
                hp_, c_ = carry
                hn, cn = _step_pallas_padded(xp, hp_, c_, wx, wh, b,
                                             block_h=_bh)
                return (hn, cn), ()
            (hn, cn), _ = jax.lax.scan(body, (hp, c), None, length=n)
            return jnp.sum(hn.astype(jnp.float32))

        fn = jax.jit(chained)
        try:
            float(fn(xp, hp, c))  # compile + warmup
        except Exception as e:  # noqa: BLE001 — report compile failure per bh
            msg = str(e).splitlines()[0][:140]
            print(f"  block_h={bh:>2}: FAILED ({msg})")
            continue
        t0 = time.perf_counter()
        float(fn(xp, hp, c))
        dt = (time.perf_counter() - t0) / n
        print(f"  block_h={bh:>2}: {dt * 1e3:8.3f} ms/step")

    if args.rollout:
        from satflow_tpu.models.conv_lstm import ConvLSTMCore
        model = ConvLSTMCore(hidden_dim=64, out_channels=12,
                             forecast_steps=24, cell_impl="fused",
                             unroll=24, head_in_scan=True,
                             dtype=jnp.bfloat16)
        x = jax.random.uniform(next(k), (B, 7, HW, HW, 12), dtype=jnp.bfloat16)
        variables = jax.jit(model.init)(rng, x)

        @jax.jit
        def chained_roll(variables, x):
            def body(x, _):
                out = model.apply(variables, x)
                return out[:, :7].astype(x.dtype), ()
            xf, _ = jax.lax.scan(body, x, None, length=10)
            return jnp.sum(xf.astype(jnp.float32))

        float(chained_roll(variables, x))
        t0 = time.perf_counter()
        float(chained_roll(variables, x))
        dt = (time.perf_counter() - t0) / 10
        fps = B * 24 / dt
        print(f"  rollout: {fps:8.2f} f/s "
              f"(SATFLOW_BLOCK_H={os.environ.get('SATFLOW_BLOCK_H', 'unset')})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
