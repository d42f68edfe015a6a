"""Fully fused ConvLSTM step: both gate convs + gate math + state update in one
Pallas kernel.

Motivation (profiled on v5e via train/profiling.py): XLA runs the 3×3 gate
convs at ~48% of MXU peak and the gate elementwise pass as a separate HBM
round-trip; per decoder step that is two conv kernels + one gate kernel + a
concat copy. This kernel computes, per (batch, row-block) grid cell:

    gates = conv3x3(x, Wx) + conv3x3(h, Wh) + b
    i,f,o,g = split(gates); c' = σ(f)·c + σ(i)·tanh(g); h' = σ(o)·tanh(c')

entirely on-chip:

- **Halo rows** come from passing the same (W-padded) array three times with
  prev/cur/next row-block index maps (clamped at the edges) and masking the
  out-of-range halo rows to zero — standard Pallas practice since blocked
  index maps cannot express overlapping windows.
- **MXU depth**: each kernel row dy is one (rows·W, 3·Cin) @ (3·Cin, 4Ch)
  matmul — the dx taps fold into the contraction via an in-VMEM im2col
  concat, giving K = 192/384 for the production channel sizes instead of the
  K = 64 of a naive per-tap formulation.
- The f32 accumulator, gate nonlinearities and state update never leave VMEM.

Flag-gated with an exact XLA fallback; custom VJP routes the backward through
the reference ops (forward latency is what the rollout bench measures).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from satflow_tpu.ops.pallas.fused_lstm import _gates_ref, pallas_available

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None

# test hook: run the kernel in the Pallas interpreter (validates the kernel
# body on CPU without a TPU compile)
_INTERPRET = False


# ---------------------------------------------------------------------------
# Reference implementation (fallback + VJP definition)
# ---------------------------------------------------------------------------


def _conv3x3(x: jax.Array, w: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _step_ref(x, h, c, wx, wh, b):
    gates = _conv3x3(x, wx) + _conv3x3(h, wh) + b
    return _gates_ref(gates, c.astype(gates.dtype))


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _make_kernel(block_h: int, width: int, scratch_im2col: bool = False):
    def kernel(
        x_prev, x_cur, x_nxt, h_prev, h_cur, h_nxt, c_ref,
        w_ref, b_ref, hout_ref, cout_ref, *maybe_scratch,
    ):
        # *_prev/cur/nxt: (1, block_h, W+2, C); w: (3, 3Cx+3Ch, 4Ch) — per
        # kernel row, x taps then h taps along the contraction axis
        r = pl.program_id(1)
        n_r = pl.num_programs(1)
        ch = cout_ref.shape[-1]
        rows = block_h * width

        def slab(prev, cur, nxt):
            top = prev[0, block_h - 1 : block_h, :, :]
            bot = nxt[0, 0:1, :, :]
            top = jnp.where(r > 0, top, jnp.zeros_like(top))
            bot = jnp.where(r < n_r - 1, bot, jnp.zeros_like(bot))
            return jnp.concatenate([top, cur[0], bot], axis=0)  # (bh+2, W+2, C)

        x_slab = slab(x_prev, x_cur, x_nxt)
        h_slab = slab(h_prev, h_cur, h_nxt)
        acc = jnp.zeros((rows, 4 * ch), jnp.float32)
        for dy in range(3):
            # one matmul per kernel row: x and h taps share the contraction
            # (K = 3·Cx + 3·Ch — full MXU depth, half the matmul launches)
            if scratch_im2col:
                # assemble the im2col row through a VMEM scratch with explicit
                # stores (avoids the lane-relayout of a 6-way concat)
                win_ref = maybe_scratch[0]
                col = 0
                for s in (x_slab, h_slab):
                    cin = s.shape[-1]
                    for dx in range(3):
                        win_ref[:, col : col + cin] = s[
                            dy : dy + block_h, dx : dx + width, :
                        ].reshape(rows, cin)
                        col += cin
                win = win_ref[:]
            else:
                win = jnp.concatenate(
                    [
                        s[dy : dy + block_h, dx : dx + width, :].reshape(rows, -1)
                        for s in (x_slab,)
                        for dx in range(3)
                    ]
                    + [
                        s[dy : dy + block_h, dx : dx + width, :].reshape(rows, -1)
                        for s in (h_slab,)
                        for dx in range(3)
                    ],
                    axis=1,
                )
            acc += jnp.dot(win, w_ref[dy], preferred_element_type=jnp.float32)
        acc += b_ref[0].astype(jnp.float32)

        c = c_ref[0].astype(jnp.float32).reshape(rows, ch)
        i = acc[:, 0 * ch : 1 * ch]
        f = acc[:, 1 * ch : 2 * ch]
        o = acc[:, 2 * ch : 3 * ch]
        g = acc[:, 3 * ch : 4 * ch]
        c_next = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_next = jax.nn.sigmoid(o) * jnp.tanh(c_next)
        cout_ref[0] = c_next.reshape(block_h, width, ch).astype(cout_ref.dtype)
        hout_ref[0] = h_next.reshape(block_h, width, ch).astype(hout_ref.dtype)

    return kernel


# Experiment toggle: assemble im2col via VMEM-scratch stores instead of a
# lane concat. Interpret-verified correct, but at production shapes the extra
# (rows, 3Cx+3Ch) scratch pushes scoped VMEM 372 KB over the 16 MB limit with
# block_h=8 — keep the concat path until a smaller-block variant is tuned.
_SCRATCH_IM2COL = False


def _step_pallas(x, h, c, wx, wh, b, block_h: int = 8):  # 16 exceeds scoped vmem
    bsz, height, width, cx = x.shape
    ch = c.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))  # W halo via cheap pad
    hp = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (0, 0)))
    # weight layout (3, 3Cx+3Ch, 4Ch): per kernel row dy, the contraction is
    # (x dx-taps then h dx-taps) × cin — matches the kernel's im2col ordering;
    # concatenated here once instead of per grid cell.
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
        return pl.BlockSpec(
            shape, lambda bi, r: (0,) * ndim, memory_space=pltpu.VMEM
        )

    out_spec = pl.BlockSpec(
        (1, block_h, width, ch), lambda bi, r: (bi, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    scratch = (
        [pltpu.VMEM((block_h * width, 3 * cx + 3 * ch), x.dtype)]
        if _SCRATCH_IM2COL
        else []
    )
    h_next, c_next = pl.pallas_call(
        _make_kernel(block_h, width, _SCRATCH_IM2COL),
        grid=grid,
        scratch_shapes=scratch,
        in_specs=[
            row_spec(cx, -1), row_spec(cx, 0), row_spec(cx, +1),
            row_spec(ch, -1), row_spec(ch, 0), row_spec(ch, +1),
            out_spec,  # c uses the output geometry
            full_spec((3, 3 * cx + 3 * ch, 4 * ch)),
            full_spec((1, 4 * ch)),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, height, width, ch), x.dtype),
            jax.ShapeDtypeStruct((bsz, height, width, ch), x.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(xp, xp, xp, hp, hp, hp, c, w3, b2)
    return h_next, c_next


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_convlstm_step(x, h, c, wx, wh, b, use_pallas: Optional[bool] = None):
    """One ConvLSTM step: (x, h, c, Wx(3,3,Cx,4Ch), Wh(3,3,Ch,4Ch), b) → (h', c')."""
    use = use_pallas
    if use is None:
        use = (
            pallas_available()
            and x.shape[1] % 8 == 0
            and c.shape[-1] % 8 == 0
            and wx.shape[:2] == (3, 3)
        )
    if use:
        return _step_pallas(x, h, c, wx, wh, b)
    return _step_ref(x, h, c, wx, wh, b)


def _fwd(x, h, c, wx, wh, b, use_pallas):
    out = fused_convlstm_step(x, h, c, wx, wh, b, use_pallas)
    return out, (x, h, c, wx, wh, b)


def _bwd(use_pallas, residuals, cotangents):
    x, h, c, wx, wh, b = residuals
    _, vjp = jax.vjp(lambda *a: _step_ref(*a), x, h, c, wx, wh, b)
    return vjp(cotangents)


fused_convlstm_step.defvjp(_fwd, _bwd)
