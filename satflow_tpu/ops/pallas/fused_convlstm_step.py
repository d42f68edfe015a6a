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

Flag-gated with an exact XLA fallback. The custom VJP is fused too: one
Pallas kernel recomputes the gates and runs the whole gate-math backward in
VMEM (emitting dgates + dc_prev), and the four linear conv grads ride XLA's
dense conv tilings (see ``_bwd`` below).
"""

from __future__ import annotations

import functools
import os
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


# Scoped-VMEM limit passed to every kernel in this module. Mosaic's compiler
# default (~16 MiB) is a fraction of a v5e core's 128 MiB; raising it to
# 64 MiB unlocks 4x-taller row blocks, measured faster at 256px (bh=8 20.52 ->
# bh=32 19.98 ms/step; bh=64 does not fit even at 99 MiB — tools/
# exp_vmem_block.py, docs/DESIGN.md). SATFLOW_VMEM_LIMIT_BYTES overrides;
# "0" restores the compiler default (and with it the r2 block picks).
_DEFAULT_VMEM_LIMIT = 64 * 1024 * 1024
_MOSAIC_DEFAULT_LIMIT = 16 * 1024 * 1024


def _vmem_limit() -> Optional[int]:
    env = os.environ.get("SATFLOW_VMEM_LIMIT_BYTES")
    if env is not None:
        return int(env) or None
    return _DEFAULT_VMEM_LIMIT


def _compiler_params() -> "pltpu.CompilerParams":
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=_vmem_limit(),
    )


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


def _make_kernel(block_h: int, width: int, scratch_im2col: bool = False,
                 padded_out: bool = False, emit_gates: bool = False):
    def kernel(
        x_prev, x_cur, x_nxt, h_prev, h_cur, h_nxt, c_ref,
        w_ref, b_ref, hout_ref, cout_ref, *rest,
    ):
        gates_ref = rest[0] if emit_gates else None
        maybe_scratch = rest[1:] if emit_gates else rest
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
        if emit_gates:
            # save-gates backward: the pre-activation gates leave the kernel
            # so the VJP's gate backward is pure elementwise (no gate-conv
            # recompute) — see _bwd_padded
            gates_ref[0] = acc.reshape(block_h, width, 4 * ch).astype(
                gates_ref.dtype
            )
        i = acc[:, 0 * ch : 1 * ch]
        f = acc[:, 1 * ch : 2 * ch]
        o = acc[:, 2 * ch : 3 * ch]
        g = acc[:, 3 * ch : 4 * ch]
        c_next = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_next = jax.nn.sigmoid(o) * jnp.tanh(c_next)
        cout_ref[0] = c_next.reshape(block_h, width, ch).astype(cout_ref.dtype)
        h_next = h_next.reshape(block_h, width, ch).astype(hout_ref.dtype)
        if padded_out:
            # h_out keeps the (W+2) padded layout so the NEXT step's conv
            # consumes it without a jnp.pad HBM round-trip. Slice-stores, not
            # a vector concat: Mosaic mis-lowers the W-axis concatenate at
            # narrow channel counts (observed tpu.concatenate crash at ch=32).
            hout_ref[0, :, 1 : width + 1, :] = h_next
            zcol = jnp.zeros((block_h, 1, ch), hout_ref.dtype)
            hout_ref[0, :, 0:1, :] = zcol
            hout_ref[0, :, width + 1 : width + 2, :] = zcol
        else:
            hout_ref[0] = h_next

    return kernel


# Experiment toggle: assemble im2col via VMEM-scratch stores instead of a
# lane concat. Interpret-verified correct, but at production shapes the extra
# (rows, 3Cx+3Ch) scratch pushes scoped VMEM 372 KB over the 16 MB limit with
# block_h=8 — keep the concat path until a smaller-block variant is tuned.
_SCRATCH_IM2COL = False


# ---------------------------------------------------------------------------
# Halo-tensor variant: each input block fetched ONCE (+2 halo rows)
#
# The prev/cur/next blocked-index-map trick fetches every x and h block three
# times — a 3x input overfetch that leaves the kernel ~40% DMA / ~40% MXU,
# poorly overlapped (measured r1: 3.77 ms/call at B=16, 256px). Here the two
# halo rows per block are gathered OUTSIDE the kernel into a small side
# tensor (B, n_blocks, 2, W+2, C) with the edge zeros baked in, so the kernel
# reads each block exactly once plus 2/block_h extra rows, and drops the
# boundary masking entirely.
# ---------------------------------------------------------------------------


def _build_halo(xp: jax.Array, block_h: int) -> jax.Array:
    """(B, H, W+2, C) padded input -> (B, n_blocks, 2, W+2, C) halo rows.

    halo[:, r, 0] is the row above block r (zeros for r=0) and halo[:, r, 1]
    the row below (zeros for the last block).
    """
    bsz, height, wp, c = xp.shape
    n_blocks = height // block_h
    zero = jnp.zeros((bsz, 1, wp, c), xp.dtype)
    # row above block r = global row r*bh - 1; below = row (r+1)*bh
    tops = jnp.concatenate([zero, xp[:, block_h - 1 :: block_h][:, :-1]], axis=1)
    bots = jnp.concatenate([xp[:, block_h::block_h], zero], axis=1)
    return jnp.stack([tops, bots], axis=2)  # (B, n_blocks, 2, W+2, C)


def _make_kernel_halo(block_h: int, width: int):
    def kernel(x_cur, x_halo, h_cur, h_halo, c_ref, w_ref, b_ref,
               hout_ref, cout_ref):
        ch = cout_ref.shape[-1]
        rows = block_h * width

        def slab(cur, halo):
            # halo block: (1, 1, 2, W+2, C) — row above then row below
            return jnp.concatenate(
                [halo[0, 0, 0:1], cur[0], halo[0, 0, 1:2]], axis=0
            )  # (bh+2, W+2, C)

        x_slab = slab(x_cur, x_halo)
        h_slab = slab(h_cur, h_halo)
        acc = jnp.zeros((rows, 4 * ch), jnp.float32)
        for dy in range(3):
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


def _step_pallas_halo(x, h, c, wx, wh, b, block_h: int = 8):
    bsz, height, width, cx = x.shape
    ch = c.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    hp = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (0, 0)))
    x_halo = _build_halo(xp, block_h)
    h_halo = _build_halo(hp, block_h)
    w3 = jnp.concatenate(
        [wx.reshape(3, 3 * cx, 4 * ch), wh.reshape(3, 3 * ch, 4 * ch)], axis=1
    )
    b2 = b.reshape(1, 4 * ch)
    n_blocks = height // block_h
    grid = (bsz, n_blocks)

    def blk_spec(c_feat):
        return pl.BlockSpec(
            (1, block_h, width + 2, c_feat), lambda bi, r: (bi, r, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def halo_spec(c_feat):
        return pl.BlockSpec(
            (1, 1, 2, width + 2, c_feat), lambda bi, r: (bi, r, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    def full_spec(shape):
        ndim = len(shape)
        return pl.BlockSpec(shape, lambda bi, r: (0,) * ndim, memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec(
        (1, block_h, width, ch), lambda bi, r: (bi, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    h_next, c_next = pl.pallas_call(
        _make_kernel_halo(block_h, width),
        grid=grid,
        in_specs=[
            blk_spec(cx), halo_spec(cx),
            blk_spec(ch), halo_spec(ch),
            out_spec,
            full_spec((3, 3 * cx + 3 * ch, 4 * ch)),
            full_spec((1, 4 * ch)),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, height, width, ch), x.dtype),
            jax.ShapeDtypeStruct((bsz, height, width, ch), x.dtype),
        ),
        compiler_params=_compiler_params(),
        interpret=_INTERPRET,
    )(xp, x_halo, hp, h_halo, c, w3, b2)
    return h_next, c_next


# Kernel variant switch: "3pass" = prev/cur/next triple-fetch formulation;
# "halo" = single-fetch + halo side tensor (above). MEASURED on v5e at the
# production rollout (256px, B=16, Ch=64): 3pass 1016 f/s vs halo 880 f/s —
# the 3x block overfetch is well hidden by the sequential-row pipeline, while
# the halo variant pays two extra tiny (2, W+2, C) DMAs per grid step plus a
# strided halo gather per scan step. Kept for re-evaluation at other shapes.
_STEP_VARIANT = "3pass"


def _normalize_block_h(height: int, bh: int) -> int:
    """Halve the row block until it divides the image height."""
    while height % bh:
        bh //= 2
    return max(bh, 1)


def _pick_block_h(height: int, width: int, cx: int, ch: int,
                  requested: Optional[int] = None, itemsize: int = 2,
                  conservative: bool = False) -> int:
    """Forward row-block size, holding the PROVEN VMEM footprint invariant.

    The production configuration (bf16, bh=8, W=256, Cx=Ch=64) is known to
    fit scoped VMEM and bh=16 there is known NOT to — i.e. the budget is
    rows x K = 2048 x 384 im2col elements at 2 bytes each. Smaller widths/
    channels leave headroom, so scale bh up (capped at 32) to keep the
    byte footprint at the proven budget: fewer grid steps, fatter matmuls
    (64px bf16: bh=32 measures 1.059 vs 1.118 ms/step on v5e, +5.6%;
    128px/64ch bf16 gets bh=16, measured correct; f32 halves the rows).

    ``conservative=True`` is for DISPATCH guards: the budget basis is capped
    at the Mosaic-default 16 MiB so a raised limit never flips a
    Pallas-vs-XLA decision to a shape class that was only ever proven at the
    default (e.g. 2048px fwd, 1024px bwd stay on the XLA path), while a
    LOWERED limit still shrinks the guard's pick so bh=1 miscompile shapes
    keep falling back. Block-size picks inside an enabled kernel use the
    full limit; tools/exp_aot_widths.py AOT-verifies the enabled frontier."""
    if requested is None:
        env = os.environ.get("SATFLOW_BLOCK_H")
        if env:
            requested = int(env)  # tuning override (tools/exp_vmem_block.py)
    if requested is not None:
        return _normalize_block_h(height, requested)
    budget = 2048 * 384 * 2  # bytes: the proven bf16 bh=8 config at the
    # Mosaic-default 16 MiB scoped limit; scale PROPORTIONALLY with the
    # actual limit in both directions (64 MiB default -> 4x, i.e. bh=32 at
    # 256px/64ch bf16 — measured faster, see _DEFAULT_VMEM_LIMIT above;
    # an 8 MiB override -> 0.5x so picked blocks still fit the scoped
    # memory actually granted to the kernel)
    limit = _vmem_limit()
    if limit and conservative:
        limit = min(limit, _MOSAIC_DEFAULT_LIMIT)
    if limit:
        budget = budget * limit // _MOSAIC_DEFAULT_LIMIT
    k = 3 * (cx + ch)
    bh = max(1, min(32, budget // max(width * k * itemsize, 1)))
    bh = 1 << (bh.bit_length() - 1)  # power of two for clean halving
    return _normalize_block_h(height, bh)


def _step_pallas(x, h, c, wx, wh, b, block_h=None):
    bsz, height, width, cx = x.shape
    ch = c.shape[-1]
    block_h = _pick_block_h(height, width, cx, ch, block_h, x.dtype.itemsize)
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
        compiler_params=_compiler_params(),
        interpret=_INTERPRET,
    )(xp, xp, xp, hp, hp, hp, c, w3, b2)
    return h_next, c_next


# ---------------------------------------------------------------------------
# Padded-IO step: x/h arrive AND h leaves in (W+2)-padded layout
#
# Inside a scan, every step re-pads its conv inputs (x=v and h per cell):
# four (B, H, W+2, C) HBM round-trips per decoder step at production shapes
# (~0.5 GB/call at B=16). Keeping h in padded layout across the whole scan —
# the kernel writes zero halo columns directly — removes those pads entirely;
# the output head then consumes the padded array with VALID-W padding.
# ---------------------------------------------------------------------------


def _step_pallas_padded(xp, hp, c, wx, wh, b, block_h=None,
                        emit_gates: bool = False):
    bsz, height, wp2, cx = xp.shape
    width = wp2 - 2
    ch = c.shape[-1]
    block_h = _pick_block_h(height, width, cx, ch, block_h, xp.dtype.itemsize)
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
        return pl.BlockSpec(shape, lambda bi, r: (0,) * ndim, memory_space=pltpu.VMEM)

    c_spec = pl.BlockSpec(
        (1, block_h, width, ch), lambda bi, r: (bi, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    hout_spec = pl.BlockSpec(
        (1, block_h, width + 2, ch), lambda bi, r: (bi, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    gates_spec = pl.BlockSpec(
        (1, block_h, width, 4 * ch), lambda bi, r: (bi, r, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_specs = (hout_spec, c_spec) + ((gates_spec,) if emit_gates else ())
    out_shape = (
        jax.ShapeDtypeStruct((bsz, height, width + 2, ch), xp.dtype),
        jax.ShapeDtypeStruct((bsz, height, width, ch), xp.dtype),
    ) + ((jax.ShapeDtypeStruct((bsz, height, width, 4 * ch), xp.dtype),)
         if emit_gates else ())
    out = pl.pallas_call(
        _make_kernel(block_h, width, padded_out=True, emit_gates=emit_gates),
        grid=grid,
        in_specs=[
            row_spec(cx, -1), row_spec(cx, 0), row_spec(cx, +1),
            row_spec(ch, -1), row_spec(ch, 0), row_spec(ch, +1),
            c_spec,
            full_spec((3, 3 * cx + 3 * ch, 4 * ch)),
            full_spec((1, 4 * ch)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_compiler_params(),
        interpret=_INTERPRET,
    )(xp, xp, xp, hp, hp, hp, c, w3, b2)
    return out if emit_gates else (out[0], out[1])


def _pad_w(a):
    return jnp.pad(a, ((0, 0), (0, 0), (1, 1), (0, 0)))


def _conv3x3_padded(xp: jax.Array, w: jax.Array) -> jax.Array:
    """conv3x3 over an already-W-padded input: SAME on H, VALID on W.

    ``_conv3x3_padded(pad_w(x), w) == _conv3x3(x, w)`` — used by the padded
    backward so the linear-grad VJPs consume/produce (W+2) arrays directly
    (no slice/re-pad copies per step)."""
    return jax.lax.conv_general_dilated(
        xp, w, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _step_ref_padded(xp, hp, c, wx, wh, b):
    h_next, c_next = _step_ref(xp[:, :, 1:-1], hp[:, :, 1:-1], c, wx, wh, b)
    return _pad_w(h_next), c_next


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_convlstm_step_padded(xp, hp, c, wx, wh, b,
                               use_pallas: Optional[bool] = None):
    """Padded-IO ConvLSTM step: x/h (B, H, W+2, C) -> (h' padded, c')."""
    use = use_pallas
    if use is None:
        use = (
            pallas_available()
            and xp.shape[1] % 8 == 0
            and c.shape[-1] % 8 == 0
            and wx.shape[:2] == (3, 3)
            # full-disk widths: the VMEM byte budget drives block_h to 1,
            # where Mosaic mis-lowers the im2col concat ("result/input
            # offset mismatch", AOT-observed at W=1024/bh=1 on the backward,
            # same concat structure here) — ride the exact XLA step instead
            and _pick_block_h(
                xp.shape[1], xp.shape[2] - 2, xp.shape[-1], c.shape[-1],
                None, xp.dtype.itemsize, conservative=True,
            ) >= 2
        )
    if use:
        return _step_pallas_padded(xp, hp, c, wx, wh, b)
    return _step_ref_padded(xp, hp, c, wx, wh, b)


def _fwd_padded(xp, hp, c, wx, wh, b, use_pallas):
    import os

    if os.environ.get("SATFLOW_SAVE_GATES", "0") == "1":
        # save-gates mode: the forward also emits the pre-activation gates so
        # the backward skips the gate-conv recompute entirely (measured: the
        # recompute is ~1 forward-kernel per step; see docs/DESIGN.md
        # training-ceiling table). Costs one (B,H,W,4Ch) bf16 residual per
        # step — under remat it lives only across the replay/backward pair.
        use = use_pallas
        if use is None:
            use = (
                pallas_available()
                and xp.shape[1] % 8 == 0
                and c.shape[-1] % 8 == 0
                and wx.shape[:2] == (3, 3)
                and _pick_block_h(  # bh=1 Mosaic guard, see dispatchers
                    xp.shape[1], xp.shape[2] - 2, xp.shape[-1], c.shape[-1],
                    None, xp.dtype.itemsize, conservative=True,
                ) >= 2
            )
        if use:
            h2, c2, gates = _step_pallas_padded(
                xp, hp, c, wx, wh, b, emit_gates=True
            )
        else:
            gates = (_conv3x3_padded(xp, wx) + _conv3x3_padded(hp, wh) + b
                     ).astype(xp.dtype)
            h2, c2 = _gates_ref(gates, c.astype(gates.dtype))
            h2 = _pad_w(h2)
        return (h2, c2), (xp, hp, c, wx, wh, b, gates)
    out = fused_convlstm_step_padded(xp, hp, c, wx, wh, b, use_pallas)
    return out, (xp, hp, c, wx, wh, b)


def _gate_bwd_ref_padded(xp, hp, c, wx, wh, b, dh_next_p, dc_next):
    """XLA reference of the padded backward: all convs run VALID-W on the
    padded inputs; the halo-column cotangents of dh' are dropped."""
    gates = _conv3x3_padded(xp, wx) + _conv3x3_padded(hp, wh) + b
    dgates, dc_prev = _gate_bwd_math(gates, c, dh_next_p[:, :, 1:-1], dc_next)
    return dgates.astype(xp.dtype), dc_prev.astype(xp.dtype)


def _bwd_padded(use_pallas, residuals, cotangents):
    """Padded-native backward: NO slice/re-pad copies per step.

    The dgates kernel consumes the padded x/h (and padded dh') directly; the
    four linear conv grads use the VALID-W formulation ``_conv3x3_padded`` so
    their VJPs produce/consume (W+2) arrays matching the scan carries. The
    halo-column gradients of dxp/dhp are genuine conv-input gradients; the
    upstream steps drop them (their halo columns are written constants)."""
    import os

    if len(residuals) == 7:  # save-gates mode (see _fwd_padded)
        xp, hp, c, wx, wh, b, gates = residuals
        dh_next_p, dc_next = cotangents
        dgates, dc_prev = _gate_bwd_math(
            gates, c, dh_next_p[:, :, 1:-1], dc_next
        )
        dgates = dgates.astype(xp.dtype)
        dc_prev = dc_prev.astype(xp.dtype)
    else:
        xp, hp, c, wx, wh, b = residuals
        dh_next_p, dc_next = cotangents
        use = use_pallas
        if use is None:
            use = (
                pallas_available()
                and xp.shape[1] % 8 == 0
                and c.shape[-1] % 8 == 0
                and wx.shape[:2] == (3, 3)
            )
        if os.environ.get("SATFLOW_FUSED_BWD", "1") == "0":
            use = False
        if use and _pick_block_h(
            xp.shape[1], xp.shape[2] - 2, xp.shape[-1], c.shape[-1], None,
            xp.dtype.itemsize, conservative=True,
        ) < 4:
            # full-disk widths: the backward's VMEM budget needs bh < 2,
            # below the Mosaic floor — ride the exact XLA gate backward
            use = False
        if use:
            dgates, dc_prev = _gate_bwd_pallas(
                xp, hp, c, wx, wh, b, dh_next_p, dc_next, padded=True
            )
        else:
            dgates, dc_prev = _gate_bwd_ref_padded(
                xp, hp, c, wx, wh, b, dh_next_p, dc_next
            )
    if os.environ.get("SATFLOW_MERGED_CONV_BWD", "1") == "1":
        # DEFAULT: merged linear grads — the separate dx conv has only
        # Cx(=12) output lanes, a <10%-occupied MXU pass. Concatenating [x|h]
        # channels runs ONE data-grad conv (Cx+Ch lanes) and ONE weight-grad
        # contraction (9*(Cx+Ch) rows) instead of four ops, at the cost of
        # one (B,H,W+2,Cx+Ch) concat per step. Measured +6.9% at 64px b32,
        # +3.8% at 256px b8 chunk=6 (tools/exp_train_ceiling.py); opt out
        # with SATFLOW_MERGED_CONV_BWD=0.
        cx = xp.shape[-1]
        xh = jnp.concatenate([xp, hp], axis=-1)
        w3c = jnp.concatenate([wx, wh], axis=2)  # (3,3,Cx+Ch,4Ch)
        _, vjp_xh = jax.vjp(lambda t: _conv3x3_padded(t, w3c), xh)
        (dxh,) = vjp_xh(dgates)
        dxp, dhp = dxh[..., :cx], dxh[..., cx:]
        _, vjp_w = jax.vjp(lambda w_: _conv3x3_padded(xh, w_), w3c)
        (dw3,) = vjp_w(dgates)
        dwx, dwh = dw3[:, :, :cx], dw3[:, :, cx:]
    else:
        _, vjp_x = jax.vjp(lambda x_: _conv3x3_padded(x_, wx), xp)
        (dxp,) = vjp_x(dgates)
        _, vjp_h = jax.vjp(lambda h_: _conv3x3_padded(h_, wh), hp)
        (dhp,) = vjp_h(dgates)
        _, vjp_wx = jax.vjp(lambda w_: _conv3x3_padded(xp, w_), wx)
        (dwx,) = vjp_wx(dgates)
        _, vjp_wh = jax.vjp(lambda w_: _conv3x3_padded(hp, w_), wh)
        (dwh,) = vjp_wh(dgates)
    db = dgates.sum(axis=(0, 1, 2)).astype(b.dtype)
    return dxp, dhp, dc_prev, dwx, dwh, db


fused_convlstm_step_padded.defvjp(_fwd_padded, _bwd_padded)


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
            # bh=1 is a known Mosaic im2col miscompile — see the padded
            # dispatcher; fall back to the exact XLA step at such widths
            and _pick_block_h(
                x.shape[1], x.shape[2], x.shape[-1], c.shape[-1],
                None, x.dtype.itemsize, conservative=True,
            ) >= 2
        )
    if use:
        import os

        variant = os.environ.get("SATFLOW_STEP_VARIANT", _STEP_VARIANT)
        if variant == "halo":
            return _step_pallas_halo(x, h, c, wx, wh, b)
        return _step_pallas(x, h, c, wx, wh, b)
    return _step_ref(x, h, c, wx, wh, b)


def _fwd(x, h, c, wx, wh, b, use_pallas):
    out = fused_convlstm_step(x, h, c, wx, wh, b, use_pallas)
    return out, (x, h, c, wx, wh, b)


# ---------------------------------------------------------------------------
# Fused backward: recompute gates + gate-math backward in ONE Pallas kernel.
#
# The step's backward splits into (a) the nonlinear gate chain and (b) four
# linear convolutions. (a) is where XLA pays an extra forward recompute plus a
# long elementwise chain over (B, H, W, 4C) HBM tensors; the kernel below does
# the recompute *and* the chain in VMEM, emitting dgates and dc_prev in one
# pass (same matmul cost as the forward). (b) — dx/dh transposed convs and
# dWx/dWh weight-grad convs — are large dense contractions XLA already tiles
# well; they are taken as VJPs of the linear conv (no recompute: conv is
# linear in each argument).
# ---------------------------------------------------------------------------


def _make_bwd_kernel(block_h: int, width: int, padded: bool = False):
    def kernel(
        x_prev, x_cur, x_nxt, h_prev, h_cur, h_nxt, c_ref,
        w_ref, b_ref, dh_ref, dc_ref, dgates_ref, dcprev_ref,
    ):
        r = pl.program_id(1)
        n_r = pl.num_programs(1)
        ch = dcprev_ref.shape[-1]
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
        if padded:
            # dh' arrives in the (W+2) padded layout; the halo columns were
            # written as constants by the forward kernel — drop their
            # cotangents here (free in VMEM).
            dh_next = dh_ref[0, :, 1:-1].astype(jnp.float32).reshape(rows, ch)
        else:
            dh_next = dh_ref[0].astype(jnp.float32).reshape(rows, ch)
        dc_next = dc_ref[0].astype(jnp.float32).reshape(rows, ch)

        si = jax.nn.sigmoid(acc[:, 0 * ch : 1 * ch])
        sf = jax.nn.sigmoid(acc[:, 1 * ch : 2 * ch])
        so = jax.nn.sigmoid(acc[:, 2 * ch : 3 * ch])
        tg = jnp.tanh(acc[:, 3 * ch : 4 * ch])
        c_next = sf * c + si * tg
        tc = jnp.tanh(c_next)

        do_pre = dh_next * tc * so * (1.0 - so)
        dct = dc_next + dh_next * so * (1.0 - tc * tc)
        di_pre = dct * tg * si * (1.0 - si)
        df_pre = dct * c * sf * (1.0 - sf)
        dg_pre = dct * si * (1.0 - tg * tg)
        dc_prev = dct * sf

        dgates = jnp.concatenate([di_pre, df_pre, do_pre, dg_pre], axis=1)
        dgates_ref[0] = dgates.reshape(block_h, width, 4 * ch).astype(
            dgates_ref.dtype
        )
        dcprev_ref[0] = dc_prev.reshape(block_h, width, ch).astype(
            dcprev_ref.dtype
        )

    return kernel


def _gate_bwd_math(gates, c, dh_next, dc_next):
    """Hand-derived gate-chain backward (f32): (dgates, dc_prev).

    Shared by the XLA reference paths (plain and padded) — the Pallas kernel
    reimplements the same chain on its in-VMEM accumulator."""
    f32 = jnp.float32
    gates = gates.astype(f32)
    i, f, o, g = jnp.split(gates, 4, axis=-1)
    si, sf, so, tg = (
        jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o), jnp.tanh(g)
    )
    c = c.astype(f32)
    c_next = sf * c + si * tg
    tc = jnp.tanh(c_next)
    dh_next = dh_next.astype(f32)
    dc_next = dc_next.astype(f32)
    do_pre = dh_next * tc * so * (1.0 - so)
    dct = dc_next + dh_next * so * (1.0 - tc * tc)
    di_pre = dct * tg * si * (1.0 - si)
    df_pre = dct * c * sf * (1.0 - sf)
    dg_pre = dct * si * (1.0 - tg * tg)
    dc_prev = dct * sf
    dgates = jnp.concatenate([di_pre, df_pre, do_pre, dg_pre], axis=-1)
    return dgates, dc_prev


def _gate_bwd_ref(x, h, c, wx, wh, b, dh_next, dc_next):
    """XLA reference of the fused backward kernel: (dgates, dc_prev)."""
    gates = _conv3x3(x, wx) + _conv3x3(h, wh) + b
    dgates, dc_prev = _gate_bwd_math(gates, c, dh_next, dc_next)
    return dgates.astype(x.dtype), dc_prev.astype(x.dtype)


def _gate_bwd_pallas(x, h, c, wx, wh, b, dh_next, dc_next,
                     block_h: Optional[int] = None, padded: bool = False):
    """dgates/dc_prev kernel. ``padded``: x/h (and dh_next) arrive in the
    (W+2) layout from padded-IO scans — no pad/slice copies here."""
    if padded:
        bsz, height, wp2, cx = x.shape
        width = wp2 - 2
        xp, hp = x, h
        dh_w = width + 2
    else:
        bsz, height, width, cx = x.shape
        xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
        hp = jnp.pad(h, ((0, 0), (0, 0), (1, 1), (0, 0)))
        dh_w = width
    ch = c.shape[-1]
    if block_h is None:
        # The backward carries roughly 2x the forward's VMEM per row block
        # (dh/dc inputs, dgates output + f32 accumulator), so size it as
        # the forward's byte-budget pick HALVED, capped at 8. The pick here
        # uses the full (raised) VMEM limit — under the 64 MiB default that
        # is fwd_pick=32 -> bh=8 at 256px/64ch bf16, which fits because the
        # kernel's scoped limit was raised by the same 4x that once made
        # bh=8 bust the 16 MiB default by 1.5 MB (AOT-measured then).
        # Under SATFLOW_VMEM_LIMIT_BYTES=0 (legacy 16 MiB) the picks revert
        # to the r2-measured set: 8@64px, 8@128px, 4@256px. WHETHER this
        # kernel runs at all is decided by the callers' conservative
        # (16 MiB-capped) guards, so full-disk widths (1024px+) that were
        # never proven here stay on the XLA gate backward regardless of the
        # limit; tools/exp_aot_widths.py AOT-verifies the enabled frontier.
        fwd_pick = _pick_block_h(height, width, cx, ch, None, x.dtype.itemsize)
        # floor 2: Mosaic mis-lowers the im2col concat at 1-row blocks
        # ("result/input offset mismatch", AOT-observed at W=1024/bh=1);
        # widths where even bh=2 busts the budget fall back to the XLA gate
        # backward in the callers (see _bwd_padded)
        block_h = min(8, max(2, fwd_pick // 2))
        while height % block_h:
            block_h //= 2
        block_h = max(block_h, 1)
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
        return pl.BlockSpec(shape, lambda bi, r: (0,) * ndim, memory_space=pltpu.VMEM)

    def out_spec(c_feat, w=width):
        return pl.BlockSpec(
            (1, block_h, w, c_feat), lambda bi, r: (bi, r, 0, 0),
            memory_space=pltpu.VMEM,
        )

    dgates, dc_prev = pl.pallas_call(
        _make_bwd_kernel(block_h, width, padded=padded),
        grid=grid,
        in_specs=[
            row_spec(cx, -1), row_spec(cx, 0), row_spec(cx, +1),
            row_spec(ch, -1), row_spec(ch, 0), row_spec(ch, +1),
            out_spec(ch),  # c
            full_spec((3, 3 * cx + 3 * ch, 4 * ch)),
            full_spec((1, 4 * ch)),
            out_spec(ch, dh_w),  # dh_next (padded width in padded mode)
            out_spec(ch),  # dc_next
        ],
        out_specs=(out_spec(4 * ch), out_spec(ch)),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, height, width, 4 * ch), x.dtype),
            jax.ShapeDtypeStruct((bsz, height, width, ch), x.dtype),
        ),
        compiler_params=_compiler_params(),
        interpret=_INTERPRET,
    )(xp, xp, xp, hp, hp, hp, c, w3, b2, dh_next, dc_next)
    return dgates, dc_prev


def _bwd(use_pallas, residuals, cotangents):
    x, h, c, wx, wh, b = residuals
    dh_next, dc_next = cotangents
    use = use_pallas
    if use is None:
        use = (
            pallas_available()
            and x.shape[1] % 8 == 0
            and c.shape[-1] % 8 == 0
            and wx.shape[:2] == (3, 3)
        )
    import os

    if os.environ.get("SATFLOW_FUSED_BWD", "1") == "0":  # A/B toggle
        use = False
    if use and _pick_block_h(
        x.shape[1], x.shape[2], x.shape[-1], c.shape[-1], None,
        x.dtype.itemsize, conservative=True,
    ) < 4:
        use = False  # see _bwd_padded: bwd bh would fall below the Mosaic floor
    if use:
        dgates, dc_prev = _gate_bwd_pallas(x, h, c, wx, wh, b, dh_next, dc_next)
    else:
        dgates, dc_prev = _gate_bwd_ref(x, h, c, wx, wh, b, dh_next, dc_next)
    # Linear pieces: conv is linear in each argument, so these VJPs are the
    # standard transposed/weight-grad convs with no recompute. Default:
    # MERGED formulation — one [x|h]-concatenated data-grad conv and one
    # weight-grad contraction instead of four ops (the separate dx conv has
    # only Cx output lanes, a mostly-idle MXU pass; measured +6.9% at 64px,
    # +3.8% at 256px — docs/DESIGN.md training-ceiling table).
    if os.environ.get("SATFLOW_MERGED_CONV_BWD", "1") == "1":
        cx = x.shape[-1]
        xh = jnp.concatenate([x, h], axis=-1)
        w3c = jnp.concatenate([wx, wh], axis=2)
        _, vjp_xh = jax.vjp(lambda t: _conv3x3(t, w3c), xh)
        (dxh,) = vjp_xh(dgates)
        dx, dh = dxh[..., :cx], dxh[..., cx:]
        _, vjp_w = jax.vjp(lambda w_: _conv3x3(xh, w_), w3c)
        (dw3,) = vjp_w(dgates)
        dwx, dwh = dw3[:, :, :cx], dw3[:, :, cx:]
    else:
        _, vjp_x = jax.vjp(lambda x_: _conv3x3(x_, wx), x)
        (dx,) = vjp_x(dgates)
        _, vjp_h = jax.vjp(lambda h_: _conv3x3(h_, wh), h)
        (dh,) = vjp_h(dgates)
        _, vjp_wx = jax.vjp(lambda w_: _conv3x3(x, w_), wx)
        (dwx,) = vjp_wx(dgates)
        _, vjp_wh = jax.vjp(lambda w_: _conv3x3(h, w_), wh)
        (dwh,) = vjp_wh(dgates)
    db = dgates.sum(axis=(0, 1, 2)).astype(b.dtype)
    return dx, dh, dc_prev, dwx, dwh, db


fused_convlstm_step.defvjp(_fwd, _bwd)
