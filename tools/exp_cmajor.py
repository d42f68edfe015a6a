"""Channel-major carry layout prototype — the last recorded perf lever.

The r2 ceiling study (docs/DESIGN.md "Where the remaining kernel time goes")
bounded the NHWC fused ConvLSTM step's residual at strided window reads
feeding the MXU — sublane-shifted (bh, W, C) slices at W-stride 258 — and
recorded "a different data layout (e.g. channel-major carries)" as the next
lever, bounded at <=1700 f/s. This tool MEASURES that lever at prototype
scale (VERDICT r4 #7) instead of carrying it as an IOU.

Formulation (the point of C-major): with carries stored channel-major and
the spatial dims FLATTENED to the lane axis — x, h, c as (B, C, SP) where
SP = (H + 2*block_h) * W, rows zero-padded block-aligned top/bottom — the
3x3 conv becomes nine ALIGNED 2D matmuls per row-block:

    out[g, s] = sum_{dy,dx,k} w[dy,dx,k,g] * xh[k, s + (dy-1)*W + (dx-1)]

- dy taps are lane-offset slices at multiples of W (256 = 2 lane tiles —
  always aligned; the NHWC kernel's W-stride-258 sublane shifts vanish),
- dx taps are two one-lane rolls of the input block computed ONCE per step
  (with W-boundary masking standing in for the zero W-halo),
- every matmul is (4C, 2C) x (2C, block_h*W) with K = 2C = 128 — exactly
  one MXU pass, no im2col assembly at all.

The gate/state math then runs gate-major on (4C, block_h*W) tiles and the
carries stay C-major across the whole scan: no transpose inside the rollout
(the one-time NHWC<->C-major converts amortize over the 24-step horizon).

Verified against the NHWC reference step (_step_ref) in interpret mode
(CPU) and on TPU; timed with the chained-scan methodology (feedback x = h',
the decoder's autoregressive pattern) against the production NHWC padded-IO
step at the ceiling-study shape (B=56, 256px, Cx=Ch=64).

Usage:  python tools/exp_cmajor.py            (TPU: verify + time)
        JAX_PLATFORMS=cpu python tools/exp_cmajor.py --verify-only
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from satflow_tpu.ops.pallas.fused_convlstm_step import (
    _compiler_params,
    _pad_w,
    _step_ref,
    fused_convlstm_step_padded,
)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None


# ---------------------------------------------------------------------------
# layout converts (outside the scan; amortized over the horizon)
# ---------------------------------------------------------------------------


def to_cmajor(a: jax.Array, block_h: int) -> jax.Array:
    """(B, H, W, C) NHWC -> (B, C, SP) flat C-major with block_h zero pad
    rows top and bottom (SP = (H + 2*block_h) * W)."""
    b, h, w, c = a.shape
    pad = jnp.zeros((b, block_h, w, c), a.dtype)
    ap = jnp.concatenate([pad, a, pad], axis=1)
    return jnp.transpose(ap, (0, 3, 1, 2)).reshape(b, c, -1)


def from_cmajor(a: jax.Array, height: int, width: int,
                block_h: int) -> jax.Array:
    """(B, C, SP) -> (B, H, W, C)."""
    b, c, _ = a.shape
    g = a.reshape(b, c, height + 2 * block_h, width)[
        :, :, block_h:block_h + height]
    return jnp.transpose(g, (0, 2, 3, 1))


def weights_cmajor(wx: jax.Array, wh: jax.Array) -> jax.Array:
    """(3,3,Cx,4C)+(3,3,Ch,4C) HWIO -> (9, 4C, Cx+Ch): per-tap gate-major
    matmul weights, tap index dy*3+dx, contraction over [x; h] channels."""
    w = jnp.concatenate([wx, wh], axis=2)          # (3, 3, 2C, 4C)
    k2, c4 = w.shape[2], w.shape[3]
    return jnp.transpose(w, (0, 1, 3, 2)).reshape(9, c4, k2)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _make_kernel(block_h: int, width: int, n_blocks: int, ch: int):
    bhw = block_h * width

    def kernel(x_m, x_c, x_p, h_m, h_c, h_p, c_ref, w_ref, b_ref,
               h_out, c_out):
        r = pl.program_id(1)
        real = jnp.logical_and(r > 0, r < n_blocks - 1)

        @pl.when(real)
        def _compute():
            # (2C, 3*bh*W): lane concat at block boundaries (aligned)
            xh = jnp.concatenate(
                [
                    jnp.concatenate([x_m[0], x_c[0], x_p[0]], axis=1),
                    jnp.concatenate([h_m[0], h_c[0], h_p[0]], axis=1),
                ],
                axis=0,
            )
            wi = jax.lax.broadcasted_iota(
                jnp.int32, xh.shape, 1) % width
            zero = jnp.zeros((), xh.dtype)
            # variant[dx][.., s] == xh[.., s + dx - 1], zero at W boundary
            # (stands in for the zero W-halo columns of the padded layout)
            x_dx0 = jnp.where(wi == 0, zero, jnp.roll(xh, 1, axis=1))
            x_dx2 = jnp.where(wi == width - 1, zero, jnp.roll(xh, -1, axis=1))
            variants = (x_dx0, xh, x_dx2)

            acc = jnp.zeros((4 * ch, bhw), jnp.float32)
            for dy in range(3):
                lo = (block_h - 1 + dy) * width
                for dx in range(3):
                    sl = variants[dx][:, lo:lo + bhw]
                    acc = acc + jax.lax.dot_general(
                        w_ref[dy * 3 + dx],
                        sl,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            gates = acc + b_ref[...].astype(jnp.float32)
            i = gates[0 * ch:1 * ch]
            f = gates[1 * ch:2 * ch]
            o = gates[2 * ch:3 * ch]
            g = gates[3 * ch:4 * ch]
            c_new = (jax.nn.sigmoid(f) * c_ref[0].astype(jnp.float32)
                     + jax.nn.sigmoid(i) * jnp.tanh(g))
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            h_out[0] = h_new.astype(h_out.dtype)
            c_out[0] = c_new.astype(c_out.dtype)

        @pl.when(jnp.logical_not(real))
        def _pad_rows():
            h_out[0] = jnp.zeros_like(h_out[0])
            c_out[0] = jnp.zeros_like(c_out[0])

    return kernel


def cmajor_step(x, h, c, w9, b, block_h: int, height: int, width: int,
                interpret: bool = False):
    """One ConvLSTM step, all operands in flat C-major layout.

    x/h/c: (B, C, SP); w9: (9, 4C, 2C); b: (4C, 1). Returns (h', c') in the
    same layout (pad rows zeroed — the carries are scan-stable)."""
    bsz, ch, sp = c.shape
    bhw = block_h * width
    n_blocks = sp // bhw
    grid = (bsz, n_blocks)

    def row_spec(offset):
        def index_map(bi, r, _o=offset):
            return (bi, 0, jnp.clip(r + _o, 0, n_blocks - 1))

        return pl.BlockSpec((1, ch, bhw), index_map,
                            memory_space=pltpu.VMEM)

    def full_spec(shape):
        ndim = len(shape)
        return pl.BlockSpec(shape, lambda bi, r: (0,) * ndim,
                            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((1, ch, bhw), lambda bi, r: (bi, 0, r),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(block_h, width, n_blocks, ch),
        grid=grid,
        in_specs=[
            row_spec(-1), row_spec(0), row_spec(+1),
            row_spec(-1), row_spec(0), row_spec(+1),
            out_spec,
            full_spec(w9.shape),
            full_spec(b.shape),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, ch, sp), x.dtype),
            jax.ShapeDtypeStruct((bsz, ch, sp), x.dtype),
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x, x, x, h, h, h, c, w9, b)


# ---------------------------------------------------------------------------
# verify + time
# ---------------------------------------------------------------------------


def _rand(key, shape, dtype):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype) * 0.1


def verify(bsz=2, height=32, width=32, ch=8, block_h=4, interpret=True,
           dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = _rand(ks[0], (bsz, height, width, ch), dtype)
    h = _rand(ks[1], (bsz, height, width, ch), dtype)
    c = _rand(ks[2], (bsz, height, width, ch), dtype)
    wx = _rand(ks[3], (3, 3, ch, 4 * ch), dtype)
    wh = _rand(ks[4], (3, 3, ch, 4 * ch), dtype)
    b = _rand(ks[5], (4 * ch,), dtype)

    h_ref, c_ref = _step_ref(x, h, c, wx, wh, b)

    w9 = weights_cmajor(wx, wh)
    h2, c2 = cmajor_step(
        to_cmajor(x, block_h), to_cmajor(h, block_h), to_cmajor(c, block_h),
        w9, b.reshape(-1, 1), block_h, height, width, interpret=interpret)
    h2 = from_cmajor(h2, height, width, block_h)
    c2 = from_cmajor(c2, height, width, block_h)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    err_h = float(jnp.max(jnp.abs(h2.astype(jnp.float32)
                                  - h_ref.astype(jnp.float32))))
    err_c = float(jnp.max(jnp.abs(c2.astype(jnp.float32)
                                  - c_ref.astype(jnp.float32))))
    print(f"verify {height}x{width} C={ch} bh={block_h} dtype={dtype.__name__}"
          f" interpret={interpret}: max|dh|={err_h:.2e} max|dc|={err_c:.2e}")
    assert err_h < tol and err_c < tol, (err_h, err_c)


def time_chain(step_fn, carry, steps=24, repeats=5):
    """Chained-scan timing: feedback x = h' (the decoder's autoregressive
    pattern) so successive steps are data-dependent, nothing is DCE'd and
    relayout/pad costs inside the loop are paid where the rollout pays them."""

    @jax.jit
    def chain(carry):
        def body(cr, _):
            x, h, c = cr
            h2, c2 = step_fn(x, h, c)
            return (h2, h2, c2), ()

        (xT, hT, cT), _ = jax.lax.scan(body, carry, None, length=steps)
        return hT, cT

    out = chain(carry)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(carry))
        best = min(best, (time.perf_counter() - t0) / steps)
    return best * 1e3  # ms/step


def main(bsz=56, height=256, width=256, ch=64, block_h=8, steps=24,
         verify_only=False):
    # correctness first: interpret (any backend), then compiled when on TPU
    verify()
    verify(bsz=1, height=64, width=128, ch=16, block_h=8)
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        verify(bsz=2, height=64, width=256, ch=64, block_h=8,
               interpret=False, dtype=jnp.bfloat16)
    if verify_only:
        print("verify-only: OK")
        return

    dtype = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    x = _rand(ks[0], (bsz, height, width, ch), dtype)
    h = _rand(ks[1], (bsz, height, width, ch), dtype)
    c = _rand(ks[2], (bsz, height, width, ch), dtype)
    wx = _rand(ks[3], (3, 3, ch, 4 * ch), dtype)
    wh = _rand(ks[4], (3, 3, ch, 4 * ch), dtype)
    b = _rand(ks[5], (4 * ch,), dtype)

    # --- NHWC baseline: the production padded-IO fused step ---------------
    def nhwc_step(xp, hp, cc):
        hp2, c2 = fused_convlstm_step_padded(xp, hp, cc, wx, wh, b)
        return hp2, c2

    ms_nhwc = time_chain(nhwc_step, (_pad_w(x), _pad_w(h), c), steps=steps)

    # --- C-major prototype -------------------------------------------------
    w9 = weights_cmajor(wx, wh)
    b2 = b.reshape(-1, 1)

    def cm_step(xc, hc, cc):
        return cmajor_step(xc, hc, cc, w9, b2, block_h, height, width)

    carry = (to_cmajor(x, block_h), to_cmajor(h, block_h),
             to_cmajor(c, block_h))
    ms_cm = time_chain(cm_step, carry, steps=steps)

    ratio = ms_nhwc / ms_cm
    print(f"\nshape B={bsz} {height}x{width} C={ch} bh={block_h} "
          f"T={steps} (chained, feedback x=h')")
    print(f"NHWC padded-IO fused step : {ms_nhwc:8.3f} ms/step")
    print(f"C-major flat step         : {ms_cm:8.3f} ms/step")
    print(f"C-major / NHWC speedup    : {ratio:8.3f}x")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--verify-only", action="store_true")
    p.add_argument("--batch", type=int, default=56)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--channels", type=int, default=64)
    p.add_argument("--block-h", type=int, default=8)
    p.add_argument("--steps", type=int, default=24)
    a = p.parse_args()
    main(a.batch, a.size, a.size, a.channels, a.block_h, a.steps,
         a.verify_only)
