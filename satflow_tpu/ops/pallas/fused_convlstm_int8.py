"""int8 fused ConvLSTM step: the serving fast path.

v5e's MXU runs int8×int8→int32 at 2× the bf16 rate (measured 374 TOP/s vs
194 TF/s on this kernel's matmul shape), and the fused step is feed-bound —
int8 also halves every byte the kernel moves (x/h blocks, the h carry, the
weights, the in-VMEM im2col copies). Quantization is static, with no
calibration pass:

- **activations**: ConvLSTM states are range-bound by construction
  (h = σ(o)·tanh(c') ∈ (−1,1); nowcasting inputs are normalized [0,1]),
  so ONE fixed scale 127 quantizes everything: ``aq = rint(a·127)``.
  The h carry stays int8 ACROSS the scan — the next step consumes it
  directly (no per-step quantize/dequantize round trips).
- **weights**: per-output-channel symmetric int8 over the merged
  (3, 3Cx+3Ch, 4Ch) gate tensor; the dequant factor
  ``s_w[col]/127`` scales the int32 accumulator once per column.
- the gate math runs in f32 on the scaled accumulator exactly like the
  bf16 kernel; c stays bf16 (elementwise only).

Inference-only: the custom VJP raises (training stays bf16 — int8 is the
serving mode; accuracy deltas are gated in tests/test_int8.py).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from satflow_tpu.ops.pallas.fused_lstm import pallas_available

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None

_INTERPRET = False
ACT_SCALE = 127.0


# ---------------------------------------------------------------------------
# Quantization helpers
# ---------------------------------------------------------------------------


def quantize_weights(wx: jax.Array, wh: jax.Array, b: jax.Array):
    """(wx, wh, b) -> (w3q int8 (3, 3Cx+3Ch, 4Ch), dequant f32 (1, 4Ch), b f32).

    Per-output-channel symmetric scales over the merged gate tensor; the
    returned ``dequant`` folds the activation scale: accf = acc_i32 * dequant.
    """
    cx, ch4 = wx.shape[2], wx.shape[3]
    ch = wh.shape[2]
    w3 = jnp.concatenate(
        [wx.reshape(3, 3 * cx, ch4), wh.reshape(3, 3 * ch, ch4)], axis=1
    ).astype(jnp.float32)
    s_w = jnp.max(jnp.abs(w3), axis=(0, 1)) / 127.0  # (4Ch,)
    s_w = jnp.maximum(s_w, 1e-12)
    w3q = jnp.clip(jnp.round(w3 / s_w), -127, 127).astype(jnp.int8)
    dequant = (s_w / ACT_SCALE).reshape(1, ch4).astype(jnp.float32)
    return w3q, dequant, b.reshape(1, ch4).astype(jnp.float32)


def quantize_activations(a: jax.Array) -> jax.Array:
    """f32/bf16 in (−1, 1) -> int8 at the fixed scale (round-to-nearest)."""
    return jnp.clip(
        jnp.round(a.astype(jnp.float32) * ACT_SCALE), -127, 127
    ).astype(jnp.int8)


def dequantize_activations(aq: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return (aq.astype(jnp.float32) * (1.0 / ACT_SCALE)).astype(dtype)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _make_kernel_int8(block_h: int, width: int):
    def kernel(x_prev, x_cur, x_nxt, h_prev, h_cur, h_nxt, c_ref,
               w_ref, s_ref, b_ref, hout_ref, cout_ref):
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

        x_slab = slab(x_prev, x_cur, x_nxt)  # int8 (bh+2, W+2, Cx)
        h_slab = slab(h_prev, h_cur, h_nxt)
        acc = jnp.zeros((rows, 4 * ch), jnp.int32)
        for dy in range(3):
            win = jnp.concatenate(
                [x_slab[dy : dy + block_h, dx : dx + width, :].reshape(rows, -1)
                 for dx in range(3)]
                + [h_slab[dy : dy + block_h, dx : dx + width, :].reshape(rows, -1)
                   for dx in range(3)],
                axis=1,
            )
            acc += jnp.dot(win, w_ref[dy], preferred_element_type=jnp.int32)
        accf = acc.astype(jnp.float32) * s_ref[0] + b_ref[0]

        c = c_ref[0].astype(jnp.float32).reshape(rows, ch)
        i = accf[:, 0 * ch : 1 * ch]
        f = accf[:, 1 * ch : 2 * ch]
        o = accf[:, 2 * ch : 3 * ch]
        g = accf[:, 3 * ch : 4 * ch]
        c_next = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_next = jax.nn.sigmoid(o) * jnp.tanh(c_next)
        cout_ref[0] = c_next.reshape(block_h, width, ch).astype(cout_ref.dtype)
        hq = jnp.round(h_next * ACT_SCALE).astype(jnp.int8)  # |h|<1: in range
        hq = hq.reshape(block_h, width, ch)
        hout_ref[0, :, 1 : width + 1, :] = hq
        zcol = jnp.zeros((block_h, 1, ch), hout_ref.dtype)
        hout_ref[0, :, 0:1, :] = zcol
        hout_ref[0, :, width + 1 : width + 2, :] = zcol

    return kernel


def _step_ref_int8(xq, hq, c, w3q, dequant, b):
    """Exact XLA reference of the int8 kernel (integer dot, same rounding).

    ``xq``/``hq`` arrive in the (W+2)-padded layout; the H halo is added here.
    """
    bsz, height, wp2, _ = xq.shape
    width = wp2 - 2
    ch = c.shape[-1]

    # im2col over the (W+2) axis exactly like the kernel
    def windows(aq):
        return [
            jax.lax.dynamic_slice_in_dim(aq, dx, width, axis=2)
            for dx in range(3)
        ]

    ap = jnp.pad(xq, ((0, 0), (1, 1), (0, 0), (0, 0)))  # H halo, zeros
    hp = jnp.pad(hq, ((0, 0), (1, 1), (0, 0), (0, 0)))
    acc = jnp.zeros((bsz, height, width, 4 * ch), jnp.int32)
    for dy in range(3):
        xs = jax.lax.dynamic_slice_in_dim(ap, dy, height, axis=1)
        hs = jax.lax.dynamic_slice_in_dim(hp, dy, height, axis=1)
        win = jnp.concatenate(windows(xs) + windows(hs), axis=-1)
        acc = acc + jax.lax.dot_general(
            win.astype(jnp.int32), w3q[dy].astype(jnp.int32),
            (((3,), (0,)), ((), ())),
        )
    accf = acc.astype(jnp.float32) * dequant.reshape(1, 1, 1, -1) + b.reshape(
        1, 1, 1, -1
    )
    i, f, o, g = jnp.split(accf, 4, axis=-1)
    c32 = c.astype(jnp.float32)
    c_next = jax.nn.sigmoid(f) * c32 + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_next = jax.nn.sigmoid(o) * jnp.tanh(c_next)
    hq_next = jnp.round(h_next * ACT_SCALE).astype(jnp.int8)
    hq_next = jnp.pad(hq_next, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return hq_next, c_next.astype(c.dtype)


_BLOCK_H = int(os.environ.get("SATFLOW_INT8_BLOCK_H", "8"))


def fused_convlstm_step_int8(xq, hq, c, w3q, dequant, b, use_pallas=None,
                             block_h=None):
    """One int8 ConvLSTM step on (W+2)-padded int8 x/h.

    xq/hq: (B, H, W+2, C) int8; c: (B, H, W, Ch) bf16/f32;
    w3q/dequant/b from :func:`quantize_weights`.
    Returns (h' int8 padded, c').
    """
    use = use_pallas
    if use is None:
        use = (
            pallas_available()
            and xq.shape[1] % 8 == 0
            and c.shape[-1] % 8 == 0
        )
    if not use:
        return _step_ref_int8(xq, hq, c, w3q, dequant, b)
    bsz, height, wp2, cx = xq.shape
    width = wp2 - 2
    ch = c.shape[-1]
    from satflow_tpu.ops.pallas.fused_convlstm_step import (
        _compiler_params,
        _normalize_block_h,
    )

    if block_h is None:
        block_h = _BLOCK_H
    block_h = _normalize_block_h(height, block_h)
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
        _make_kernel_int8(block_h, width),
        grid=grid,
        in_specs=[
            row_spec(cx, -1), row_spec(cx, 0), row_spec(cx, +1),
            row_spec(ch, -1), row_spec(ch, 0), row_spec(ch, +1),
            c_spec,
            full_spec(w3q.shape),
            full_spec((1, 4 * ch)),
            full_spec((1, 4 * ch)),
        ],
        out_specs=(hout_spec, c_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, height, width + 2, ch), jnp.int8),
            jax.ShapeDtypeStruct((bsz, height, width, ch), c.dtype),
        ),
        # same raised scoped-VMEM limit as the bf16 kernel (the r3 study's
        # bigger-block win needs it: at the Mosaic-default 16 MiB, bh=16/32
        # fails on the f32 accumulator — the documented int8 block ceiling)
        compiler_params=_compiler_params(),
        interpret=_INTERPRET,
    )(xq, xq, xq, hq, hq, hq, c, w3q, dequant, b)
    return h_next, c_next


# ---------------------------------------------------------------------------
# Functional int8 rollout over a fused ConvLSTMCore params tree
# ---------------------------------------------------------------------------


def quantize_convlstm_params(params: Dict) -> Dict:
    """Quantize a fused-cell ConvLSTMCore params tree for the int8 rollout."""
    from satflow_tpu.parallel.spatial import _cell_params

    e1, e2, d1, d2, head = _cell_params(params)

    def q(cell):
        return quantize_weights(
            cell["x_gates_kernel"], cell["h_gates_kernel"], cell["bias"]
        )

    return {
        "encoder_1": q(e1), "encoder_2": q(e2),
        "decoder_1": q(d1), "decoder_2": q(d2),
        "head": {
            "kernel": head["kernel"].astype(jnp.bfloat16),
            "bias": head["bias"].astype(jnp.bfloat16),
        },
    }


def int8_rollout(qparams: Dict, x: jax.Array, forecast_steps: int,
                 unroll: int = 8) -> jax.Array:
    """(B, T, H, W, C) in [0,1] -> (B, steps, H, W, out), int8 fast path.

    Matches ConvLSTMCore's fused rollout (encoder scan -> autoregressive
    decoder scan -> per-step 3x3 head + sigmoid) with int8 cells; the head
    runs bf16 on the dequantized h4.
    """
    b, t, h, w, cx = x.shape
    ch = qparams["encoder_1"][0].shape[-1] // 4
    # inputs are normalized [0,1] (cloud masks / scaled radiances): the fixed
    # scale covers them; quantize ONCE outside the scan, with the W halo baked
    xq = quantize_activations(x)
    xq = jnp.pad(xq, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))

    def zeros_q():
        return jnp.zeros((b, h, w + 2, ch), jnp.int8)

    def zeros_c():
        return jnp.zeros((b, h, w, ch), jnp.bfloat16)

    def cell(q, hq, c, inp):
        w3q, dequant, bias = q
        return fused_convlstm_step_int8(inp, hq, c, w3q, dequant, bias)

    def enc_step(carry, x_t):
        (h1, c1), (h2, c2) = carry
        h1, c1 = cell(qparams["encoder_1"], h1, c1, x_t)
        h2, c2 = cell(qparams["encoder_2"], h2, c2, h1)
        return ((h1, c1), (h2, c2)), None

    carry, _ = jax.lax.scan(
        enc_step, ((zeros_q(), zeros_c()), (zeros_q(), zeros_c())),
        jnp.moveaxis(xq, 1, 0), unroll=min(unroll, t),
    )
    (_, _), (h2, _) = carry

    head_k = qparams["head"]["kernel"]
    head_b = qparams["head"]["bias"]

    def dec_step(carry, _):
        (h3, c3), (h4, c4), v = carry
        h3, c3 = cell(qparams["decoder_1"], h3, c3, v)
        h4, c4 = cell(qparams["decoder_2"], h4, c4, h3)
        h4f = dequantize_activations(h4)  # (B, H, W+2, Ch) bf16
        out = jax.lax.conv_general_dilated(
            h4f, head_k, (1, 1), ((1, 1), (0, 0)),  # SAME-H, VALID-W on halo
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + head_b
        return ((h3, c3), (h4, c4), h4), out

    _, outs = jax.lax.scan(
        dec_step, ((zeros_q(), zeros_c()), (zeros_q(), zeros_c()), h2),
        None, length=forecast_steps, unroll=min(unroll, forecast_steps),
    )
    return jax.nn.sigmoid(jnp.moveaxis(outs, 0, 1).astype(jnp.bfloat16))
