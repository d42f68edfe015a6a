"""AOT-compile the fused ConvLSTM kernels across the enabled dispatch frontier.

The block picker (`_pick_block_h`) scales its byte budget with the scoped
VMEM limit, so raising the default limit changes WHICH block each enabled
shape gets; dispatch decisions themselves are pinned to the 16 MiB-calibrated
conservative pick (see `_pick_block_h(conservative=True)`). This tool sweeps
the (width, dtype) grid, reports for each shape the dispatch decision and
the actual block pick, and — for every shape dispatched to Pallas —
AOT-compiles forward AND backward (both the unpadded and padded-IO
entry points) so Mosaic lowering failures surface here, not mid-training.

Run on TPU (optionally under a SATFLOW_VMEM_LIMIT_BYTES override):

    python -m tools.exp_aot_widths [--widths 64 128 256 512 1024 2048]

Exit status is non-zero if any Pallas-dispatched shape fails to compile.
Results recorded in docs/DESIGN.md (VMEM-limit section).
"""

import argparse
import sys


def _parse():
    p = argparse.ArgumentParser()
    p.add_argument("--widths", type=int, nargs="*",
                   default=[64, 128, 256, 512, 1024, 2048])
    p.add_argument("--channels", type=int, default=64)
    p.add_argument("--cx", type=int, default=64)
    return p.parse_args()


def main():
    args = _parse()
    import jax
    import jax.numpy as jnp
    from satflow_tpu.ops.pallas import fused_convlstm_step as m

    if jax.devices()[0].platform != "tpu":
        print("not on TPU; AOT verification needs the Mosaic backend",
              file=sys.stderr)
        return 1

    cx, ch = args.cx, args.channels
    failures = []
    for hw in args.widths:
        for dtype in (jnp.bfloat16, jnp.float32):
            dt = jnp.dtype(dtype)
            pick = m._pick_block_h(hw, hw, cx, ch, None, dt.itemsize)
            guard = m._pick_block_h(hw, hw, cx, ch, None, dt.itemsize,
                                    conservative=True)
            fwd_on = guard >= 2
            bwd_on = guard >= 4
            print(f"W={hw:>4} {dt.name:>8}: pick={pick:>2} guard={guard:>2} "
                  f"fwd={'pallas' if fwd_on else 'xla'} "
                  f"bwd={'pallas' if bwd_on else 'xla'}")
            if not fwd_on:
                continue

            x = jnp.zeros((1, hw, hw, cx), dtype)
            h = jnp.zeros((1, hw, hw, ch), dtype)
            c = jnp.zeros((1, hw, hw, ch), dtype)
            wx = jnp.zeros((3, 3, cx, 4 * ch), dtype)
            wh = jnp.zeros((3, 3, ch, 4 * ch), dtype)
            b = jnp.zeros((4 * ch,), dtype)
            xp = jnp.zeros((1, hw, hw + 2, cx), dtype)
            hp = jnp.zeros((1, hw, hw + 2, ch), dtype)

            def loss(a):
                hn, _ = m.fused_convlstm_step(*a)
                return jnp.sum(hn.astype(jnp.float32))

            def loss_padded(a):
                hn, _ = m.fused_convlstm_step_padded(*a)
                return jnp.sum(hn.astype(jnp.float32))

            for label, fn, a in (
                ("fwd+bwd", jax.grad(loss), (x, h, c, wx, wh, b)),
                ("padded fwd+bwd", jax.grad(loss_padded),
                 (xp, hp, c, wx, wh, b)),
            ):
                try:
                    jax.jit(fn).lower(a).compile()
                    print(f"  {label}: COMPILES")
                except Exception as e:  # noqa: BLE001 — report per shape
                    msg = str(e).splitlines()[0][:160]
                    print(f"  {label}: FAILED: {msg}")
                    failures.append((hw, dt.name, label, msg))

    if failures:
        print(f"\n{len(failures)} frontier shape(s) FAILED:", file=sys.stderr)
        for hw, name, label, msg in failures:
            print(f"  W={hw} {name} {label}: {msg}", file=sys.stderr)
        return 1
    print("\nall Pallas-dispatched frontier shapes compile")
    return 0


if __name__ == "__main__":
    sys.exit(main())
