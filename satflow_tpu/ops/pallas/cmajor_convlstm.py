"""Channel-major flat-lane ConvLSTM step + 3x3 conv head (Pallas, TPU).

Adopted from the measured r5 prototype (``tools/exp_cmajor.py``): with the
recurrent carries stored channel-major and the spatial dims FLATTENED to the
lane axis — ``(B, C, SP)``, ``SP = (H + 2*block_h) * W``, rows zero-padded
block-aligned top and bottom — the 3x3 conv becomes nine ALIGNED
``(4C, Cx+Ch) x (Cx+Ch, block_h*W)`` matmuls per row block:

- dy taps are lane-offset slices at multiples of W (W % 128 == 0 keeps them
  lane-tile aligned),
- dx taps are two one-lane rolls of the input block computed ONCE per step
  (W-boundary masking stands in for the zero W-halo columns),
- every matmul is one MXU pass with K = Cx+Ch; no im2col assembly at all.

The NHWC kernel's W-stride-(W+2) sublane-shifted window reads — the measured
residual of the r2 ceiling study (docs/DESIGN.md "Where the remaining kernel
time goes") — vanish. Measured vs the production NHWC padded-IO fused step at
the ceiling-study shape (B=56, 256px, C=64, T=24 chained feedback):
19.07 vs 23.37 ms/step = **1.225x** (bh=8; bh=16 1.199x, bh=32 1.127x).

Backward: custom VJP routed through the exact NHWC reference step (layout
converts + ``_step_ref`` autodiff) — correct everywhere but conversion-bound;
the C-major path is the INFERENCE formulation (the BASELINE.json headline
rollout is inference). Reference provenance for the cell math:
satflow/models/layers/ConvLSTM.py:42-57.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from satflow_tpu.ops.pallas.fused_convlstm_step import (
    _compiler_params,
    _step_ref,
)
from satflow_tpu.ops.pallas.fused_lstm import pallas_available

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None

# test hook: run the kernels in the Pallas interpreter (validates the kernel
# bodies on CPU without a TPU compile)
_INTERPRET = False

#: measured optimum at 256px C=64 (19.07 ms/step vs 19.35 at bh=4, 19.55 at
#: bh=16, 20.79 at bh=32 — tools/exp_cmajor.py sweep, r5)
_DEFAULT_BLOCK_H = 8


def default_block_h(height: int) -> int:
    bh = int(os.environ.get("SATFLOW_CMAJOR_BLOCK_H", _DEFAULT_BLOCK_H))
    while height % bh:
        bh -= 1
    return max(1, bh)


def cmajor_supported(height: int, width: int, *channels: int) -> bool:
    """Whether the Pallas C-major kernels take this geometry (the exact XLA
    fallback handles everything else)."""
    return (
        width % 128 == 0
        and height % default_block_h(height) == 0
        and all(c % 8 == 0 for c in channels)
    )


def _use_pallas() -> bool:
    return pl is not None and (pallas_available() or _INTERPRET)


# ---------------------------------------------------------------------------
# layout converts (outside the scan; amortized over the rollout horizon)
# ---------------------------------------------------------------------------


def to_cmajor(a: jax.Array, block_h: int) -> jax.Array:
    """(B, H, W, C) NHWC -> (B, C, SP) flat C-major with ``block_h`` zero pad
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


def from_cmajor_seq(a: jax.Array, height: int, width: int,
                    block_h: int) -> jax.Array:
    """(B, T, C, SP) stacked scan output -> (B, T, H, W, C) — ONE transpose
    for the whole rollout instead of per-step converts."""
    b, t, c, _ = a.shape
    g = a.reshape(b, t, c, height + 2 * block_h, width)[
        :, :, :, block_h:block_h + height]
    return jnp.transpose(g, (0, 1, 3, 4, 2))


def weights_cmajor(wx: jax.Array, wh: jax.Array) -> jax.Array:
    """(3,3,Cx,4C)+(3,3,Ch,4C) HWIO -> (9, 4C, Cx+Ch): per-tap gate-major
    matmul weights, tap index dy*3+dx, contraction over [x; h] channels."""
    w = jnp.concatenate([wx, wh], axis=2)          # (3, 3, Cx+Ch, 4C)
    k2, c4 = w.shape[2], w.shape[3]
    return jnp.transpose(w, (0, 1, 3, 2)).reshape(9, c4, k2)


def conv_weights_cmajor(w: jax.Array) -> jax.Array:
    """(3,3,Cin,Cout) HWIO -> (9, Cout, Cin) per-tap matmul weights."""
    cin, cout = w.shape[2], w.shape[3]
    return jnp.transpose(w, (0, 1, 3, 2)).reshape(9, cout, cin)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _tap_variants(xh: jax.Array, width: int):
    """The three dx-shift views of a (K, 3*bh*W) slab, W-boundary masked."""
    wi = jax.lax.broadcasted_iota(jnp.int32, xh.shape, 1) % width
    zero = jnp.zeros((), xh.dtype)
    x_dx0 = jnp.where(wi == 0, zero, jnp.roll(xh, 1, axis=1))
    x_dx2 = jnp.where(wi == width - 1, zero, jnp.roll(xh, -1, axis=1))
    return (x_dx0, xh, x_dx2)


def _nine_tap_acc(variants, w_ref, block_h: int, width: int, bhw: int):
    """sum over the nine taps of w[tap] @ shifted-slice — the 3x3 conv."""
    acc = None
    for dy in range(3):
        lo = (block_h - 1 + dy) * width
        for dx in range(3):
            sl = variants[dx][:, lo:lo + bhw]
            term = jax.lax.dot_general(
                w_ref[dy * 3 + dx], sl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = term if acc is None else acc + term
    return acc


def _make_cell_kernel(block_h: int, width: int, n_blocks: int, ch: int):
    bhw = block_h * width

    def kernel(x_m, x_c, x_p, h_m, h_c, h_p, c_ref, w_ref, b_ref,
               h_out, c_out):
        r = pl.program_id(1)
        real = jnp.logical_and(r > 0, r < n_blocks - 1)

        @pl.when(real)
        def _compute():
            # (Cx+Ch, 3*bh*W): lane concat at block boundaries (aligned)
            xh = jnp.concatenate(
                [
                    jnp.concatenate([x_m[0], x_c[0], x_p[0]], axis=1),
                    jnp.concatenate([h_m[0], h_c[0], h_p[0]], axis=1),
                ],
                axis=0,
            )
            gates = _nine_tap_acc(_tap_variants(xh, width), w_ref,
                                  block_h, width, bhw)
            gates = gates + b_ref[...].astype(jnp.float32)
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


def _make_conv_kernel(block_h: int, width: int, n_blocks: int):
    bhw = block_h * width

    def kernel(x_m, x_c, x_p, w_ref, b_ref, out):
        r = pl.program_id(1)
        real = jnp.logical_and(r > 0, r < n_blocks - 1)

        @pl.when(real)
        def _compute():
            xh = jnp.concatenate([x_m[0], x_c[0], x_p[0]], axis=1)
            acc = _nine_tap_acc(_tap_variants(xh, width), w_ref,
                                block_h, width, bhw)
            acc = acc + b_ref[...].astype(jnp.float32)
            out[0] = acc.astype(out.dtype)

        @pl.when(jnp.logical_not(real))
        def _pad_rows():
            out[0] = jnp.zeros_like(out[0])

    return kernel


def _row_specs(ch: int, bhw: int, n_blocks: int):
    def row_spec(offset):
        def index_map(bi, r, _o=offset):
            return (bi, 0, jnp.clip(r + _o, 0, n_blocks - 1))

        return pl.BlockSpec((1, ch, bhw), index_map,
                            memory_space=pltpu.VMEM)

    return row_spec(-1), row_spec(0), row_spec(+1)


def _full_spec(shape):
    ndim = len(shape)
    return pl.BlockSpec(shape, lambda bi, r: (0,) * ndim,
                        memory_space=pltpu.VMEM)


def _cell_pallas(x, h, c, w9, b2, block_h, height, width):
    bsz, ch, sp = c.shape
    cx = x.shape[1]
    bhw = block_h * width
    n_blocks = sp // bhw
    grid = (bsz, n_blocks)
    x_specs = _row_specs(cx, bhw, n_blocks)
    h_specs = _row_specs(ch, bhw, n_blocks)
    out_spec = pl.BlockSpec((1, ch, bhw), lambda bi, r: (bi, 0, r),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_cell_kernel(block_h, width, n_blocks, ch),
        grid=grid,
        in_specs=[*x_specs, *h_specs, out_spec,
                  _full_spec(w9.shape), _full_spec(b2.shape)],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, ch, sp), h.dtype),
            jax.ShapeDtypeStruct((bsz, ch, sp), h.dtype),
        ),
        compiler_params=_compiler_params(),
        interpret=_INTERPRET,
    )(x, x, x, h, h, h, c, w9, b2)


def _conv_pallas(x, w9, b2, block_h, height, width):
    bsz, cin, sp = x.shape
    cout = w9.shape[1]
    bhw = block_h * width
    n_blocks = sp // bhw
    grid = (bsz, n_blocks)
    x_specs = _row_specs(cin, bhw, n_blocks)
    out_spec = pl.BlockSpec((1, cout, bhw), lambda bi, r: (bi, 0, r),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_conv_kernel(block_h, width, n_blocks),
        grid=grid,
        in_specs=[*x_specs, _full_spec(w9.shape), _full_spec(b2.shape)],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, cout, sp), x.dtype),
        compiler_params=_compiler_params(),
        interpret=_INTERPRET,
    )(x, x, x, w9, b2)


# ---------------------------------------------------------------------------
# public ops: exact XLA fallback + reference-routed VJP
# ---------------------------------------------------------------------------


def _step_ref_cmajor(x, h, c, wx, wh, b, block_h, height, width):
    xn = from_cmajor(x, height, width, block_h)
    hn = from_cmajor(h, height, width, block_h)
    cn = from_cmajor(c, height, width, block_h)
    h2, c2 = _step_ref(xn, hn, cn, wx, wh, b)
    return to_cmajor(h2, block_h), to_cmajor(c2, block_h)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def cmajor_convlstm_step(x, h, c, wx, wh, b, block_h, height, width):
    """One ConvLSTM step with x/h/c in flat C-major layout (B, C*, SP).

    Weights stay HWIO ((3,3,Cx,4C), (3,3,Ch,4C), (4C,)) — the per-tap
    matmul transform is a ~1 MB transpose, negligible inside the scan.
    Returns (h', c') in the same layout (pad-row blocks zeroed, so the
    carries are scan-stable)."""
    if _use_pallas() and cmajor_supported(height, width,
                                          x.shape[1], h.shape[1]):
        w9 = weights_cmajor(wx, wh)
        return _cell_pallas(x, h, c, w9, b.reshape(-1, 1),
                            block_h, height, width)
    return _step_ref_cmajor(x, h, c, wx, wh, b, block_h, height, width)


def _step_fwd(x, h, c, wx, wh, b, block_h, height, width):
    out = cmajor_convlstm_step(x, h, c, wx, wh, b, block_h, height, width)
    return out, (x, h, c, wx, wh, b)


def _step_bwd(block_h, height, width, res, ct):
    x, h, c, wx, wh, b = res
    _, vjp = jax.vjp(
        lambda *a: _step_ref_cmajor(*a, block_h, height, width),
        x, h, c, wx, wh, b,
    )
    return vjp(ct)


cmajor_convlstm_step.defvjp(_step_fwd, _step_bwd)


def _conv_ref_cmajor(x, w, b, block_h, height, width):
    xn = from_cmajor(x, height, width, block_h)
    out = jax.lax.conv_general_dilated(
        xn, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    return to_cmajor(out, block_h)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def cmajor_conv3x3(x, w, b, block_h, height, width):
    """SAME 3x3 conv + bias on a flat C-major tensor (the output head).

    x: (B, Cin, SP); w: (3,3,Cin,Cout) HWIO; b: (Cout,). The zero pad-row
    blocks supply the H padding; W-boundary masking supplies the W padding —
    identical math to a SAME NHWC conv."""
    if _use_pallas() and cmajor_supported(height, width, x.shape[1]):
        return _conv_pallas(x, conv_weights_cmajor(w), b.reshape(-1, 1),
                            block_h, height, width)
    return _conv_ref_cmajor(x, w, b, block_h, height, width)


def _conv_fwd(x, w, b, block_h, height, width):
    return cmajor_conv3x3(x, w, b, block_h, height, width), (x, w, b)


def _conv_bwd(block_h, height, width, res, ct):
    x, w, b = res
    _, vjp = jax.vjp(
        lambda *a: _conv_ref_cmajor(*a, block_h, height, width), x, w, b
    )
    return vjp(ct)


cmajor_conv3x3.defvjp(_conv_fwd, _conv_bwd)
