"""Kernel ceiling study: alternative fused-ConvLSTM-step formulations.

Hypothesis tested (and REFUTED — results recorded in docs/DESIGN.md): that the
shipped kernel's per-dy 6-way lane concat (im2col assembly) idles the MXU.
Variants measured on v5e at the production decoder shape (B=56, 256px, 64ch):

- shipped 3-matmul im2col          21.34 ms  101.4 TF/s
- tap9 (ONE channel concat, 9 window matmuls K=Cx+Ch)   21.40 ms
- tap9 with 3D dot_general (no explicit reshape)         21.33 ms
- nogate (EXP_NOGATE=1: same matmuls/DMA, no sigmoid/tanh) 20.68 ms

i.e. neither the im2col assembly nor the gate-math chain is the bottleneck;
the residual gap to the ~11 ms matmul roofline is the strided window reads
feeding the MXU, inherent to the (block_h, W, C) slab layout.

Run on TPU: python -m tools.exp_tap9   (EXP_NOGATE=1 for the no-gate variant)
"""

import functools
import time

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel_tap9(block_h: int, width: int, padded_out: bool = True,
                      flat: bool = True):
    def kernel(x_prev, x_cur, x_nxt, h_prev, h_cur, h_nxt, c_ref,
               w_ref, b_ref, hout_ref, cout_ref):
        r = pl.program_id(1)
        n_r = pl.num_programs(1)
        ch = cout_ref.shape[-1]
        rows = block_h * width

        def slab(prev, cur, nxt):
            top = prev[0, block_h - 1 : block_h, :, :]
            bot = nxt[0, 0:1, :, :]
            top = jnp.where(r > 0, top, jnp.zeros_like(top))
            bot = jnp.where(r < n_r - 1, bot, jnp.zeros_like(bot))
            return jnp.concatenate([top, cur[0], bot], axis=0)

        x_slab = slab(x_prev, x_cur, x_nxt)
        h_slab = slab(h_prev, h_cur, h_nxt)
        # ONE channel concat: (bh+2, W+2, Cx+Ch)
        xh = jnp.concatenate([x_slab, h_slab], axis=-1)
        acc = jnp.zeros((rows, 4 * ch), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                win = xh[dy : dy + block_h, dx : dx + width, :]
                if flat:
                    win = win.reshape(rows, -1)
                    acc += jnp.dot(win, w_ref[dy * 3 + dx],
                                   preferred_element_type=jnp.float32)
                else:
                    acc += jax.lax.dot_general(
                        win, w_ref[dy * 3 + dx],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(rows, 4 * ch)
        acc += b_ref[0].astype(jnp.float32)

        c = c_ref[0].astype(jnp.float32).reshape(rows, ch)
        i = acc[:, 0 * ch : 1 * ch]
        f = acc[:, 1 * ch : 2 * ch]
        o = acc[:, 2 * ch : 3 * ch]
        g = acc[:, 3 * ch : 4 * ch]
        c_next = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_next = jax.nn.sigmoid(o) * jnp.tanh(c_next)
        cout_ref[0] = c_next.reshape(block_h, width, ch).astype(cout_ref.dtype)
        h_next = h_next.reshape(block_h, width, ch).astype(hout_ref.dtype)
        if padded_out:
            hout_ref[0, :, 1 : width + 1, :] = h_next
            zcol = jnp.zeros((block_h, 1, ch), hout_ref.dtype)
            hout_ref[0, :, 0:1, :] = zcol
            hout_ref[0, :, width + 1 : width + 2, :] = zcol
        else:
            hout_ref[0] = h_next

    return kernel


def step_tap9(xp, hp, c, wx, wh, b, block_h: int = 8, interpret: bool = False,
              flat: bool = True):
    bsz, height, wp2, cx = xp.shape
    width = wp2 - 2
    ch = c.shape[-1]
    # (9, Cx+Ch, 4Ch): per (dy,dx) tap, x channels then h channels
    w9 = jnp.concatenate([wx, wh], axis=2).reshape(9, cx + ch, 4 * ch)
    b2 = b.reshape(1, 4 * ch)
    n_blocks = height // block_h
    grid = (bsz, n_blocks)

    def row_spec(c_feat, offset):
        def index_map(bi, r, _offset=offset):
            return (bi, jnp.clip(r + _offset, 0, n_blocks - 1), 0, 0)

        return pl.BlockSpec(
            (1, block_h, width + 2, c_feat), index_map, memory_space=pltpu.VMEM
        )

    def full_spec(shape):
        ndim = len(shape)
        return pl.BlockSpec(shape, lambda bi, r: (0,) * ndim,
                            memory_space=pltpu.VMEM)

    c_spec = pl.BlockSpec(
        (1, block_h, width, ch), lambda bi, r: (bi, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    hout_spec = pl.BlockSpec(
        (1, block_h, width + 2, ch), lambda bi, r: (bi, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    h_next, c_next = pl.pallas_call(
        _make_kernel_tap9(block_h, width, padded_out=True, flat=flat),
        grid=grid,
        in_specs=[
            row_spec(cx, -1), row_spec(cx, 0), row_spec(cx, +1),
            row_spec(ch, -1), row_spec(ch, 0), row_spec(ch, +1),
            c_spec,
            full_spec((9, cx + ch, 4 * ch)),
            full_spec((1, 4 * ch)),
        ],
        out_specs=(hout_spec, c_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, height, width + 2, ch), xp.dtype),
            jax.ShapeDtypeStruct((bsz, height, width, ch), xp.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, xp, xp, hp, hp, hp, c, w9, b2)
    return h_next, c_next


def main():
    from satflow_tpu.ops.pallas.fused_convlstm_step import (
        _step_pallas_padded,
        _step_ref_padded,
    )

    on_tpu = jax.devices()[0].platform == "tpu"
    # correctness first (small shape, interpret off-TPU)
    B, H, W, CX, CH = 2, 16, 16, 8, 8
    rng = jax.random.PRNGKey(0)
    k = iter(jax.random.split(rng, 10))
    xp = jax.random.uniform(next(k), (B, H, W + 2, CX), dtype=jnp.float32)
    xp = xp.at[:, :, 0].set(0).at[:, :, -1].set(0)
    hp = jax.random.uniform(next(k), (B, H, W + 2, CH), dtype=jnp.float32)
    hp = hp.at[:, :, 0].set(0).at[:, :, -1].set(0)
    c = jax.random.uniform(next(k), (B, H, W, CH), dtype=jnp.float32)
    wx = jax.random.normal(next(k), (3, 3, CX, 4 * CH)) * 0.1
    wh = jax.random.normal(next(k), (3, 3, CH, 4 * CH)) * 0.1
    b = jax.random.normal(next(k), (4 * CH,)) * 0.1
    href, cref = _step_ref_padded(xp, hp, c, wx, wh, b)
    h9, c9 = step_tap9(xp, hp, c, wx, wh, b, block_h=8, interpret=not on_tpu)
    err = max(float(jnp.abs(h9 - href).max()), float(jnp.abs(c9 - cref).max()))
    print(f"tap9 correctness max err: {err:.2e}")
    assert err < 1e-4

    if not on_tpu:
        print("no TPU; stopping after interpret-mode check")
        return

    # production decoder shape timing
    B, H, W, CX, CH = 56, 256, 256, 64, 64
    k = iter(jax.random.split(jax.random.PRNGKey(1), 10))
    xp = jax.random.uniform(next(k), (B, H, W + 2, CX), dtype=jnp.bfloat16)
    hp = jax.random.uniform(next(k), (B, H, W + 2, CH), dtype=jnp.bfloat16)
    c = jax.random.uniform(next(k), (B, H, W, CH), dtype=jnp.bfloat16)
    wx = (jax.random.normal(next(k), (3, 3, CX, 4 * CH)) * 0.05).astype(jnp.bfloat16)
    wh = (jax.random.normal(next(k), (3, 3, CH, 4 * CH)) * 0.05).astype(jnp.bfloat16)
    b = jnp.zeros((4 * CH,), jnp.bfloat16)
    flops = B * H * W * (9 * (CX + CH)) * 4 * CH * 2

    def timeit(step_fn, name, **kw):
        @jax.jit
        def run(xp, hp, c):
            def body(carry, _):
                hp_, c_ = carry
                h2, c2 = step_fn(xp, hp_, c_, wx, wh, b, **kw)
                return (h2, c2), ()
            (hf, cf), _ = jax.lax.scan(body, (hp, c), None, length=20)
            return jnp.sum(hf.astype(jnp.float32))

        float(run(xp, hp, c))
        t0 = time.perf_counter(); float(run(xp, hp, c))
        dt = (time.perf_counter() - t0) / 20
        print(f"{name:28s} {dt*1e3:8.3f} ms  {flops/dt/1e12:6.1f} TF/s")
        return dt

    timeit(_step_pallas_padded, "shipped 3-matmul im2col")
    for bh in (8, 16):
        try:
            timeit(functools.partial(step_tap9, block_h=bh, flat=True),
                   f"tap9 flat bh={bh}")
        except Exception as e:  # noqa: BLE001
            print(f"tap9 flat bh={bh} FAILED: {type(e).__name__}: {str(e)[:120]}")
    try:
        timeit(functools.partial(step_tap9, block_h=8, flat=False),
               "tap9 3d-dot bh=8")
    except Exception as e:  # noqa: BLE001
        print(f"tap9 3d-dot FAILED: {type(e).__name__}: {str(e)[:120]}")




# ---------------------------------------------------------------------------
# Variant instrumentation: how much kernel time is the gate-math chain?
# "nogate" replaces the sigmoid/tanh state update with plain slices of the
# accumulator (same matmuls, same DMA, no transcendentals).
# ---------------------------------------------------------------------------


def _make_kernel_nogate(block_h: int, width: int):
    def kernel(x_prev, x_cur, x_nxt, h_prev, h_cur, h_nxt, c_ref,
               w_ref, b_ref, hout_ref, cout_ref):
        r = pl.program_id(1)
        n_r = pl.num_programs(1)
        ch = cout_ref.shape[-1]
        rows = block_h * width

        def slab(prev, cur, nxt):
            top = prev[0, block_h - 1 : block_h, :, :]
            bot = nxt[0, 0:1, :, :]
            top = jnp.where(r > 0, top, jnp.zeros_like(top))
            bot = jnp.where(r < n_r - 1, bot, jnp.zeros_like(bot))
            return jnp.concatenate([top, cur[0], bot], axis=0)

        x_slab = slab(x_prev, x_cur, x_nxt)
        h_slab = slab(h_prev, h_cur, h_nxt)
        acc = jnp.zeros((rows, 4 * ch), jnp.float32)
        for dy in range(3):
            win = jnp.concatenate(
                [x_slab[dy : dy + block_h, dx : dx + width, :].reshape(rows, -1)
                 for dx in range(3)]
                + [h_slab[dy : dy + block_h, dx : dx + width, :].reshape(rows, -1)
                   for dx in range(3)],
                axis=1,
            )
            acc += jnp.dot(win, w_ref[dy], preferred_element_type=jnp.float32)
        acc += b_ref[0].astype(jnp.float32)
        c = c_ref[0].astype(jnp.float32).reshape(rows, ch)
        c_next = acc[:, 0:ch] + c  # no transcendentals
        h_next = acc[:, ch : 2 * ch] + c_next
        cout_ref[0] = c_next.reshape(block_h, width, ch).astype(cout_ref.dtype)
        h_next = h_next.reshape(block_h, width, ch).astype(hout_ref.dtype)
        hout_ref[0, :, 1 : width + 1, :] = h_next
        zcol = jnp.zeros((block_h, 1, ch), hout_ref.dtype)
        hout_ref[0, :, 0:1, :] = zcol
        hout_ref[0, :, width + 1 : width + 2, :] = zcol

    return kernel


def step_nogate(xp, hp, c, wx, wh, b, block_h: int = 8):
    bsz, height, wp2, cx = xp.shape
    width = wp2 - 2
    ch = c.shape[-1]
    w3 = jnp.concatenate(
        [wx.reshape(3, 3 * cx, 4 * ch), wh.reshape(3, 3 * ch, 4 * ch)], axis=1
    )
    b2 = b.reshape(1, 4 * ch)
    n_blocks = height // block_h
    grid = (bsz, n_blocks)

    def row_spec(c_feat, offset):
        def index_map(bi, r, _offset=offset):
            return (bi, jnp.clip(r + _offset, 0, n_blocks - 1), 0, 0)
        return pl.BlockSpec(
            (1, block_h, width + 2, c_feat), index_map, memory_space=pltpu.VMEM
        )

    def full_spec(shape):
        ndim = len(shape)
        return pl.BlockSpec(shape, lambda bi, r: (0,) * ndim,
                            memory_space=pltpu.VMEM)

    c_spec = pl.BlockSpec(
        (1, block_h, width, ch), lambda bi, r: (bi, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    hout_spec = pl.BlockSpec(
        (1, block_h, width + 2, ch), lambda bi, r: (bi, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _make_kernel_nogate(block_h, width),
        grid=grid,
        in_specs=[
            row_spec(cx, -1), row_spec(cx, 0), row_spec(cx, +1),
            row_spec(ch, -1), row_spec(ch, 0), row_spec(ch, +1),
            c_spec,
            full_spec((3, 3 * cx + 3 * ch, 4 * ch)),
            full_spec((1, 4 * ch)),
        ],
        out_specs=(hout_spec, c_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, height, width + 2, ch), xp.dtype),
            jax.ShapeDtypeStruct((bsz, height, width, ch), xp.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(xp, xp, xp, hp, hp, hp, c, w3, b2)


def main_nogate():
    B, H, W, CX, CH = 56, 256, 256, 64, 64
    k = iter(jax.random.split(jax.random.PRNGKey(1), 10))
    xp = jax.random.uniform(next(k), (B, H, W + 2, CX), dtype=jnp.bfloat16)
    hp = jax.random.uniform(next(k), (B, H, W + 2, CH), dtype=jnp.bfloat16)
    c = jax.random.uniform(next(k), (B, H, W, CH), dtype=jnp.bfloat16)
    wx = (jax.random.normal(next(k), (3, 3, CX, 4 * CH)) * 1e-3).astype(jnp.bfloat16)
    wh = (jax.random.normal(next(k), (3, 3, CH, 4 * CH)) * 1e-3).astype(jnp.bfloat16)
    b = jnp.zeros((4 * CH,), jnp.bfloat16)
    flops = B * H * W * (9 * (CX + CH)) * 4 * CH * 2

    @jax.jit
    def run(xp, hp, c):
        def body(carry, _):
            hp_, c_ = carry
            h2, c2 = step_nogate(xp, hp_, c_ * 1e-3, wx, wh, b)
            return (h2, c2 * 0 + c), ()
        (hf, cf), _ = jax.lax.scan(body, (hp, c), None, length=20)
        return jnp.sum(hf.astype(jnp.float32))

    float(run(xp, hp, c))
    t0 = time.perf_counter(); float(run(xp, hp, c))
    dt = (time.perf_counter() - t0) / 20
    print(f"{'nogate (matmul+DMA only)':28s} {dt*1e3:8.3f} ms  {flops/dt/1e12:6.1f} TF/s")


if __name__ == "__main__":
    import os

    if os.environ.get("EXP_NOGATE"):
        main_nogate()
    else:
        main()
